"""S3/MinIO object-store CLIENT transport (reference parity).

The reference's production transport is boto3, NOT Spark's s3a
(src/s3_json_to_xml.py: get_s3_client:40, download_file:84,
put_object with ContentType:269-274) — so the client path needs no
hadoop-aws jars and is testable against ANY S3-compatible endpoint,
including the in-process moto server the integration test boots
(tests/test_objectstore.py). The Spark-side s3a transport remains a
separate, jar-gated seam (tests/test_integration_gated.py).

boto3 is import-gated: the functions raise a clear error when the SDK
is absent rather than breaking module import for the whole package.
"""

from __future__ import annotations

import json
from typing import Any


def make_s3_client(
    endpoint_url: str | None = None,
    access_key: str = "test",
    secret_key: str = "test",
    region: str = "us-east-1",
):
    """An S3 client bound to ``endpoint_url`` (MinIO/moto/localstack) or
    to real AWS when None — the reference's get_s3_client development/
    production split, minus its env-var plumbing: endpoint selection is
    an explicit argument here, so tests and deployments configure it
    without patching environment state."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - environment gate
        raise NotImplementedError(
            "object-store client transport requires boto3"
        ) from e

    return boto3.client(
        "s3",
        endpoint_url=endpoint_url,
        aws_access_key_id=access_key,
        aws_secret_access_key=secret_key,
        region_name=region,
    )


def upload_xml(client, bucket: str, key: str, xml_content: str) -> None:
    """The reference's upload_xml_string_to_s3 body (put_object with
    UTF-8 bytes and the application/xml content type — reference
    src/s3_json_to_xml.py:269-274), without its logging scaffolding."""
    client.put_object(
        Bucket=bucket,
        Key=key,
        Body=xml_content.encode("utf-8"),
        ContentType="application/xml",
    )


def download_json(client, bucket: str, key: str) -> Any:
    """The reference's download_json_from_s3 + read_json_file collapsed
    to one call: fetch the object and parse it as JSON (reference
    src/s3_json_to_xml.py:71-114 downloads to a temp file first; the
    parse result is identical)."""
    body = client.get_object(Bucket=bucket, Key=key)["Body"].read()
    return json.loads(body.decode("utf-8"))
