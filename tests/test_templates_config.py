"""Template rendering parity + config loading tests (SURVEY.md §5 item 3)."""

import textwrap

import pytest

from agnostic_blockchain_etl_spark.plans.config import (PipelineConfig,
                                                        _parse_duration)
from agnostic_blockchain_etl_spark.plans.templates import (TemplateError,
                                                           TemplateSet,
                                                           render_string)


class TestRender:
    def test_var_substitution(self):
        assert render_string("buffer_{{.START}}_{{.END}}",
                             {"START": 0, "END": 99}) == "buffer_0_99"

    def test_missing_key_renders_no_value(self):
        # Go missingkey=default parity (internal/utils/utils.go:80)
        assert render_string("x={{.NOPE}}", {}) == "x=<no value>"

    def test_default_filter(self):
        t = '{{.CH_DATABASE | default "default"}}'
        assert render_string(t, {}) == "default"
        assert render_string(t, {"CH_DATABASE": "mydb"}) == "mydb"
        assert render_string('{{.P | default ""}}', {}) == ""

    def test_default_treats_zero_and_false_as_empty_like_sprig(self):
        """sprig's `default` fires on ANY empty value (nil, '', 0,
        false, empty collections) — batch 0 injects START=0, so
        reference templates leaning on this must render identically
        (review finding)."""
        t = '{{.START | default "latest"}}'
        assert render_string(t, {"START": 0}) == "latest"
        assert render_string(t, {"START": 5}) == "5"
        assert render_string('{{.F | default "x"}}', {"F": False}) == "x"
        assert render_string('{{.F | default "x"}}', {"F": []}) == "x"
        # non-empty string "0" is NOT empty in sprig
        assert render_string(t, {"START": "0"}) == "0"

    def test_if_block(self):
        t = "a{{ if .X }},b{{ end }},c"
        assert render_string(t, {"X": 1}) == "a,b,c"
        assert render_string(t, {}) == "a,c"
        assert render_string(t, {"X": False}) == "a,c"

    def test_nested_if(self):
        t = "{{ if .A }}1{{ if .B }}2{{ end }}3{{ end }}"
        assert render_string(t, {"A": 1, "B": 1}) == "123"
        assert render_string(t, {"A": 1}) == "13"
        assert render_string(t, {}) == ""

    def test_else(self):
        t = "{{ if .A }}yes{{ else }}no{{ end }}"
        assert render_string(t, {"A": 1}) == "yes"
        assert render_string(t, {}) == "no"

    def test_unclosed_if_raises(self):
        with pytest.raises(TemplateError):
            render_string("{{ if .A }}x", {"A": 1})

    def test_reference_transform_sql_renders(self):
        # the actual simplest reference template shape
        t = textwrap.dedent("""\
            select * from {{.SOURCE_TABLE}}
            where timestamp >= addDays(toDate(0), {{.START}})
              and timestamp < addDays(toDate(1), {{.END}})""")
        out = render_string(t, {"SOURCE_TABLE": "events", "START": 5, "END": 9})
        assert "from events" in out and "toDate(0), 5" in out and "toDate(1), 9" in out


class TestTemplateSet:
    def test_load_and_render(self, tmp_path):
        (tmp_path / "a.sql").write_text("select {{.X}}")
        (tmp_path / "b.sql").write_text("select 2")
        ts = TemplateSet.load(tmp_path)
        assert ts.names() == ["a.sql", "b.sql"]
        assert ts.render("a.sql", {"X": 42}) == "select 42"
        with pytest.raises(TemplateError):
            ts.render("missing.sql", {})


class TestConfig:
    def test_duration(self):
        assert _parse_duration("10s") == 10.0
        assert _parse_duration("60s") == 60.0
        assert _parse_duration("1h") == 3600.0
        assert _parse_duration("500ms") == 0.5
        assert _parse_duration(7) == 7.0

    def test_reference_yaml_shape(self, tmp_path):
        # same key names as examples/ethereum_blocks/pipeline.yaml
        y = tmp_path / "pipeline.yaml"
        y.write_text(textwrap.dedent("""\
            Engine:
              Local:
                Settings: {max_execution_time: 300}
            Batcher: {MaxBatchSize: 100}
            TipTracker: {PollInterval: 60s}
            Init:
              Setup: [create_remote_table.sql]
            Steps:
              - Stage:
                  Files: [create_buffer.sql]
                Workers: 2
              - Sequencer: {}
              - Stage:
                  Files: [write_to_sink.sql, delete_buffer.sql]
            """))
        c = PipelineConfig.from_yaml(y, env={})
        assert c.Batcher.MaxBatchSize == 100
        assert c.TipTracker.PollIntervalS == 60.0
        assert c.Init.Setup == ["create_remote_table.sql"]
        assert len(c.Steps) == 3
        assert c.Steps[0].Workers == 2
        assert c.Steps[0].Stage.Files == ["create_buffer.sql"]
        assert c.Steps[1].Sequencer is not None
        assert c.Steps[1].Workers == 1  # sequencer forces Workers=1
        assert c.Steps[2].Stage.Files == ["write_to_sink.sql", "delete_buffer.sql"]

    def test_env_overrides(self, tmp_path):
        y = tmp_path / "p.yaml"
        y.write_text("Batcher: {MaxBatchSize: 100}\n")
        c = PipelineConfig.from_yaml(y, env={"AGN_BATCHER_MAXBATCHSIZE": "50"})
        assert c.Batcher.MaxBatchSize == 50

    def test_env_override_applies_when_yaml_omits_the_key(self, tmp_path):
        """Review finding: with no Batcher section in the YAML the
        override landed under the UPPERCASE env spelling, which
        from_dict's case-sensitive lookup never saw — the documented
        override was a silent no-op. Omitted sections/keys must insert
        under their canonical names."""
        y = tmp_path / "p.yaml"
        y.write_text("Vars: {X: 1}\n")     # no Batcher, no TipTracker
        c = PipelineConfig.from_yaml(
            y, env={"AGN_BATCHER_MAXBATCHSIZE": "50",
                    "AGN_BATCHER_STOPAFTER": "3",
                    "AGN_TIPTRACKER_POLLINTERVAL": "5s"})
        assert c.Batcher.MaxBatchSize == 50
        assert c.Batcher.StopAfter == 3
        assert c.TipTracker.PollIntervalS == 5.0

    def test_defaults(self):
        c = PipelineConfig.from_dict({})
        assert c.Batcher.MaxBatchSize == 100        # batcher.go:17-19
        assert c.TipTracker.PollIntervalS == 10.0   # tip_tracker.go:25-27
        assert c.Retry.MaxBatchSizeMultiplier == 0.8  # pipeline_retrier.go:28-30
