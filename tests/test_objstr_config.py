"""Object-store config/template loading (reference loads pipeline.yaml
through objstr from file/s3/http, cmd/pipeline/pipeline.go:63-78): the
config must load from an http URL, templates from file:// prefixes, and a
full pipeline must run from an http-served config with a local
--template-path."""

import os
import sys
import threading
import uuid
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.plans.config import PipelineConfig
from agnostic_blockchain_etl_spark.plans.objstr import (ObjstrError,
                                                        parent_url, read_text)
from agnostic_blockchain_etl_spark.plans.templates import (TemplateError,
                                                           TemplateSet)

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def http_examples():
    """Serve the examples/ tree over local http."""
    handler = partial(SimpleHTTPRequestHandler, directory=EXAMPLES)
    server = HTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_read_text_http(http_examples):
    text = read_text(f"{http_examples}/orders_to_daily_parquet/pipeline.yaml")
    assert "Batcher" in text


def test_config_from_http_url(http_examples):
    conf = PipelineConfig.from_yaml(
        f"{http_examples}/orders_to_daily_parquet/pipeline.yaml", env={})
    assert conf.Batcher.MaxBatchSize > 0
    assert conf.Steps


def test_templates_from_file_url():
    ts = TemplateSet.load(f"file://{EXAMPLES}/orders_to_daily_parquet")
    assert "transform.sql" in ts.names()


def test_http_template_listing_is_an_explicit_error(http_examples):
    with pytest.raises(TemplateError, match="cannot be listed"):
        TemplateSet.load(f"{http_examples}/orders_to_daily_parquet")


def test_parent_url():
    assert parent_url("http://h/x/pipeline.yaml") == "http://h/x"
    assert parent_url("/a/b/pipeline.yaml") == "/a/b"


def test_s3_errors_actionably():
    """The s3 path is real code, environment-gated: without the SDK it
    raises ObjstrError naming boto3; with the SDK but no credentials it
    surfaces the AWS auth error — either way a clear, non-silent
    failure."""
    try:
        import botocore.exceptions as bex
        expected = (ObjstrError, bex.BotoCoreError, bex.ClientError)
    except ImportError:
        expected = (ObjstrError,)
    with pytest.raises(expected):
        read_text("s3://bucket/key.yaml")


def test_cli_pipeline_from_http_config(http_examples, tmp_path):
    """Full run: http config URL + local --template-path, through the same
    entry point an operator uses."""
    from agnostic_blockchain_etl_spark.plans.cli import main

    sink = f"objstr_daily_{uuid.uuid4().hex[:8]}"
    rc = main([
        "pipeline",
        f"{http_examples}/orders_to_daily_parquet/pipeline.yaml",
        "--template-path", os.path.join(EXAMPLES, "orders_to_daily_parquet"),
        "--var", f"SOURCE_PATH={SF_DIR}/orders.parquet",
        "--var", f"TARGET_PATH={tmp_path / 'daily'}",
        "--var", f"SINK_TABLE={sink}",
    ])
    assert rc == 0
    assert any(d.startswith("date=") for d in os.listdir(tmp_path / "daily"))
