"""Ray-Data-native parse → enrich → route → aggregate telemetry pipeline.

A brand-new engine with the query/data-processing capabilities of the
`dev7a/otelcol-con-spaneventtolog` OpenTelemetry connector (reference at
/root/reference, read-only), generalized to Common-Crawl-style web-page
Parquet tables per BASELINE.json. Nothing here calls ray.init(); sessions
are owned by bench.py / CLI entry points / the test fixture.
"""

from .config import AttributeMappings, PipelineConfig

__all__ = ["AttributeMappings", "PipelineConfig"]
