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
    def from_dict(
        d: dict[str, Any], base: "PipelineConfig | None" = None
    ) -> "PipelineConfig":
        """Build from a YAML-shaped dict (mapstructure key names).

        Without ``base``, absent keys get zero values (the plain-constructor
        contract the internal config round-trips rely on). With ``base``,
        absent keys inherit from it and present keys replace its values
        wholly — the Collector semantics of unmarshalling user YAML onto
        ``createDefaultConfig()``'s result (factory.go:27-37).
        """
        zeros = PipelineConfig()
        b = base if base is not None else zeros

        def get(key: str) -> Any:
            return d[key] if d.get(key) is not None else getattr(b, key)

        am_d = d.get("attribute_mappings") or {}
        base_am = b.attribute_mappings

        def gam(key: str) -> str:
            return (
                am_d[key]
                if am_d.get(key) is not None
                else getattr(base_am, key)
            )

        cfg = PipelineConfig(
            include_event_names=tuple(get("include_event_names")),
            include_span_context=bool(get("include_span_context")),
            log_attributes_from=tuple(get("log_attributes_from")),
            severity_by_event_name=dict(get("severity_by_event_name")),
            add_level=bool(get("add_level")),
            severity_attribute=get("severity_attribute"),
            attribute_mappings=AttributeMappings(
                body=gam("body"),
                severity_number=gam("severity_number"),
                severity_text=gam("severity_text"),
                event_name=gam("event_name"),
            ),
            observed_timestamp_ns=get("observed_timestamp_ns"),
        )
        cfg.validate()
        return cfg

    @staticmethod
    def from_yaml(source: str) -> "PipelineConfig":
        """Build from YAML text or a path to a YAML file — the analog of the
        Collector unmarshalling YAML onto the DEFAULT config (factory.go:18-43
        + 27-37): keys absent from the YAML keep their createDefaultConfig
        values; keys present replace them wholly. Validated on load.
        """
        import os

        import yaml

        if os.path.exists(source):
            with open(source) as f:
                data = yaml.safe_load(f)
        else:
            data = yaml.safe_load(source)
        return PipelineConfig.from_dict(data or {}, base=PipelineConfig.default())

    def sorted_event_name_rules(self) -> list[tuple[str, int, str]]:
        """severity_by_event_name rules as (lower_key, number, canon_text),
        sorted longest-key-first with lexicographic tiebreak (deterministic
        stand-in for Go's map-iteration nondeterminism, connector.go:317-329),
        dropping rules whose severity doesn't parse (connector.go:322-326 —
        only 'unspecified' survives validation yet fails map_severity).
        """
        from .sevmap import map_severity, simple_lower

        rules = []
        for key, sev in self.severity_by_event_name.items():
            num, txt = map_severity(sev)
            if num != 0:
                rules.append((simple_lower(key), num, txt, len(key)))
        rules.sort(key=lambda r: (-r[3], r[0]))
        return [(k, n, t) for k, n, t, _ in rules]
