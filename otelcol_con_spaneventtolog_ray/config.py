"""Pipeline configuration mirroring the reference's Config schema.

Field-for-field port of `/root/reference/spaneventtologconnector/config/config.go:11-71`
with validation semantics from `config/config.go:74-122` and defaults from
`factory.go:27-37`. This config vocabulary is the user-facing API contract of
the pipeline (SURVEY.md §2, op J/K).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .sevmap import VALID_CONFIG_SEVERITIES

VALID_ATTRIBUTE_SOURCES = frozenset(
    {"event.attributes", "span.attributes", "resource.attributes"}
)


@dataclass(frozen=True)
class AttributeMappings:
    """How event attributes map to log record fields (config/config.go:11-27)."""

    body: str = ""
    severity_number: str = ""
    severity_text: str = ""
    event_name: str = ""


@dataclass(frozen=True)
class PipelineConfig:
    """Connector configuration (config/config.go:30-71).

    ``default()`` mirrors createDefaultConfig (factory.go:27-37).
    """

    include_event_names: tuple[str, ...] = ()
    include_span_context: bool = False
    log_attributes_from: tuple[str, ...] = ()
    severity_by_event_name: dict[str, str] = field(default_factory=dict)
    add_level: bool = False
    severity_attribute: str = ""
    attribute_mappings: AttributeMappings = field(default_factory=AttributeMappings)

    # --- engine-side knobs (not part of the reference vocabulary) ---
    #: fixed observed_timestamp (ns since epoch) for byte-stable outputs;
    #: None -> wall clock at transform time (reference connector.go:341 behavior)
    observed_timestamp_ns: int | None = None

    @staticmethod
    def default() -> "PipelineConfig":
        return PipelineConfig(
            include_span_context=True,
            log_attributes_from=("event.attributes", "resource.attributes"),
            severity_by_event_name={"exception": "error"},
        )

    def validate(self) -> None:
        """Raise ValueError exactly where config/config.go:74-122 errors."""
        for source in self.log_attributes_from:
            if source not in VALID_ATTRIBUTE_SOURCES:
                raise ValueError(f"invalid log attributes source: {source}")
        for event_name, severity in self.severity_by_event_name.items():
            if severity not in VALID_CONFIG_SEVERITIES:
                raise ValueError(
                    f"invalid severity level for event {event_name}: {severity}"
                )

    def should_copy_attributes(self, source: str) -> bool:
        """connector.go:407-414."""
        return source in self.log_attributes_from

    @staticmethod
    def from_dict(d: dict[str, Any]) -> "PipelineConfig":
        """Build from a YAML-shaped dict (mapstructure key names)."""
        am = d.get("attribute_mappings", {}) or {}
        cfg = PipelineConfig(
            include_event_names=tuple(d.get("include_event_names", ()) or ()),
            include_span_context=bool(d.get("include_span_context", False)),
            log_attributes_from=tuple(d.get("log_attributes_from", ()) or ()),
            severity_by_event_name=dict(d.get("severity_by_event_name", {}) or {}),
            add_level=bool(d.get("add_level", False)),
            severity_attribute=d.get("severity_attribute", "") or "",
            attribute_mappings=AttributeMappings(
                body=am.get("body", "") or "",
                severity_number=am.get("severity_number", "") or "",
                severity_text=am.get("severity_text", "") or "",
                event_name=am.get("event_name", "") or "",
            ),
            observed_timestamp_ns=d.get("observed_timestamp_ns"),
        )
        cfg.validate()
        return cfg

    @staticmethod
    def from_yaml(source: str) -> "PipelineConfig":
        """Build from YAML text or a path to a YAML file — the analog of the
        Collector unmarshalling YAML onto Config (factory.go:18-43). Accepts
        the connector's exact mapstructure key vocabulary; validated on load.
        """
        import os

        import yaml

        if os.path.exists(source):
            with open(source) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(source)
        return PipelineConfig.from_dict(data or {})

    def sorted_event_name_rules(self) -> list[tuple[str, int, str]]:
        """severity_by_event_name rules as (lower_key, number, canon_text),
        sorted longest-key-first with lexicographic tiebreak (deterministic
        stand-in for Go's map-iteration nondeterminism, connector.go:317-329),
        dropping rules whose severity doesn't parse (connector.go:322-326 —
        only 'unspecified' survives validation yet fails map_severity).
        """
        from .sevmap import map_severity

        rules = []
        for key, sev in self.severity_by_event_name.items():
            num, txt = map_severity(sev)
            if num != 0:
                rules.append((key.lower(), num, txt, len(key)))
        rules.sort(key=lambda r: (-r[3], r[0]))
        return [(k, n, t) for k, n, t, _ in rules]
