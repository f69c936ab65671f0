"""Config defaults + validation semantics (config/config.go:74-122,
factory.go:27-37; TestCreateDefaultConfig connector_test.go:153-165)."""

import pytest

from otelcol_con_spaneventtolog_ray.config import AttributeMappings, PipelineConfig


def test_default_config():
    cfg = PipelineConfig.default()
    assert cfg.include_span_context is True
    assert cfg.log_attributes_from == ("event.attributes", "resource.attributes")
    assert cfg.severity_by_event_name == {"exception": "error"}
    assert cfg.add_level is False
    assert cfg.severity_attribute == ""
    assert cfg.attribute_mappings == AttributeMappings()
    cfg.validate()


@pytest.mark.parametrize("source", ["event.attributes", "span.attributes", "resource.attributes"])
def test_valid_sources(source):
    PipelineConfig(log_attributes_from=(source,)).validate()


@pytest.mark.parametrize("source", ["event", "attributes", "resource", "span", "x"])
def test_invalid_sources(source):
    with pytest.raises(ValueError, match="invalid log attributes source"):
        PipelineConfig(log_attributes_from=(source,)).validate()


@pytest.mark.parametrize("sev", ["trace", "debug4", "info", "warn3", "error", "fatal4", "unspecified"])
def test_valid_severities(sev):
    PipelineConfig(severity_by_event_name={"x": sev}).validate()


@pytest.mark.parametrize("sev", ["warning", "err", "ERROR", "info1", "trace5", "bogus", ""])
def test_invalid_severities(sev):
    # validation accepts only the 25 canonical strings — aliases/variants that
    # map_severity accepts are still config errors (config.go:89-121)
    with pytest.raises(ValueError, match="invalid severity level"):
        PipelineConfig(severity_by_event_name={"evt": sev}).validate()


def test_from_dict_roundtrip():
    cfg = PipelineConfig.from_dict(
        {
            "include_event_names": ["a", "b"],
            "include_span_context": True,
            "log_attributes_from": ["event.attributes"],
            "severity_by_event_name": {"x": "warn"},
            "add_level": True,
            "severity_attribute": "sev",
            "attribute_mappings": {"body": "b", "event_name": "en"},
        }
    )
    assert cfg.include_event_names == ("a", "b")
    assert cfg.attribute_mappings.body == "b"
    assert cfg.attribute_mappings.severity_number == ""


def test_from_yaml():
    cfg = PipelineConfig.from_yaml(
        "include_event_names: [a]\nadd_level: true\n"
        "attribute_mappings: {severity_text: st}\n"
    )
    assert cfg.include_event_names == ("a",)
    assert cfg.add_level and cfg.attribute_mappings.severity_text == "st"
    with pytest.raises(ValueError):
        PipelineConfig.from_yaml("severity_by_event_name: {x: nope}")


def test_sorted_rules_longest_first_lexicographic_tiebreak():
    cfg = PipelineConfig(
        severity_by_event_name={
            "ab": "warn", "zz": "error", "abc": "fatal", "skipme": "unspecified"
        }
    )
    rules = cfg.sorted_event_name_rules()
    # 'unspecified' parses invalid -> dropped from matching (connector.go:322-326)
    assert [r[0] for r in rules] == ["abc", "ab", "zz"]
    assert rules[0][2] == "fatal"


def test_from_yaml_merges_onto_defaults():
    # the Collector unmarshals YAML onto createDefaultConfig's result:
    # absent keys inherit, present keys replace wholly
    cfg = PipelineConfig.from_yaml("add_level: true")
    assert cfg.add_level is True
    assert cfg.include_span_context is True  # inherited default
    assert cfg.log_attributes_from == ("event.attributes", "resource.attributes")
    assert cfg.severity_by_event_name == {"exception": "error"}
    # present key replaces wholly (explicit empty map wins over the default)
    cfg2 = PipelineConfig.from_yaml("severity_by_event_name: {}")
    assert cfg2.severity_by_event_name == {}
    # explicit false overrides the true default
    cfg3 = PipelineConfig.from_yaml("include_span_context: false")
    assert cfg3.include_span_context is False
