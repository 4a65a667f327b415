"""REAL S3-protocol round-trip of the reference's object-store
transport — no docker needed: moto's ThreadedMotoServer speaks the S3
HTTP API in-process, and the repo's client path (boto3, exactly like
the reference's src/s3_json_to_xml.py — NOT s3a) talks to it over a
real socket. This closes the 'no object store ever exercised' gap for
the CLIENT transport; the Spark-side s3a write remains jar-gated in
tests/test_integration_gated.py.
"""

from __future__ import annotations

import socket

import pytest

moto = pytest.importorskip("moto")

from kafka_s3_etl_spark.sources.objectstore import (  # noqa: E402
    download_json,
    make_s3_client,
    upload_xml,
)

REFERENCE_JSON = "/root/reference/data/sample_products.json"
GOLDEN_XML = "/root/reference/data/output.xml"


@pytest.fixture(scope="module")
def s3_endpoint():
    from moto.server import ThreadedMotoServer

    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port)
    server.start()
    try:
        yield f"http://127.0.0.1:{port}"
    finally:
        server.stop()


def test_reference_pipeline_end_to_end_over_real_s3_api(spark, s3_endpoint):
    """The full reference B pipeline over a live S3 endpoint: the
    source JSON is uploaded, downloaded back through the S3 API,
    rendered to the single XML document, put_object'd with the
    reference's ContentType, and read back — the final object must be
    byte-identical to the reference's committed golden output.xml."""
    import json
    import tempfile

    from kafka_s3_etl_spark.operators.xml_pipeline import build_xml_document

    client = make_s3_client(endpoint_url=s3_endpoint)
    client.create_bucket(Bucket="spark-graft-it")

    # stage the source JSON in the object store, as production does
    with open(REFERENCE_JSON, "rb") as fh:
        client.put_object(
            Bucket="spark-graft-it", Key="in/products.json", Body=fh.read()
        )
    data = download_json(client, "spark-graft-it", "in/products.json")
    with open(REFERENCE_JSON, encoding="utf-8") as fh:
        assert data == json.load(fh)  # transport is lossless

    # render from the downloaded copy (what the reference does with its
    # temp file) and upload the assembled document
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as tf:
        json.dump(data, tf)
        staged = tf.name
    doc = build_xml_document(spark, staged)
    upload_xml(client, "spark-graft-it", "out/output.xml", doc)

    obj = client.get_object(Bucket="spark-graft-it", Key="out/output.xml")
    assert obj["ContentType"] == "application/xml"
    with open(GOLDEN_XML, "rb") as fh:
        assert obj["Body"].read() == fh.read()


def test_overwrite_and_list_semantics(s3_endpoint):
    """put_object over an existing key replaces it (the reference
    re-runs its pipeline into the same key daily); listing sees exactly
    the keys written."""
    client = make_s3_client(endpoint_url=s3_endpoint)
    client.create_bucket(Bucket="spark-graft-it2")
    upload_xml(client, "spark-graft-it2", "a.xml", "<a/>")
    upload_xml(client, "spark-graft-it2", "a.xml", "<b/>")
    upload_xml(client, "spark-graft-it2", "c.xml", "<c/>")
    got = client.get_object(Bucket="spark-graft-it2", Key="a.xml")
    assert got["Body"].read() == b"<b/>"
    keys = sorted(
        o["Key"]
        for o in client.list_objects_v2(Bucket="spark-graft-it2")["Contents"]
    )
    assert keys == ["a.xml", "c.xml"]
