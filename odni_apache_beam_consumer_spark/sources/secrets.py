"""Credential fetching — the reference's ``get_secret()`` made injectable.

The reference fetches a JSON secret from AWS Secrets Manager at pipeline
construction time (/root/reference/main.py:31-54, invoked at main.py:71)
and then never uses the parsed value (broker list and password are
hardcoded at main.py:87,92 — one of its latent bugs). Here the provider is
a plain callable so tests inject a fake and production injects boto3;
the secret actually feeds the Kafka options.
"""

from __future__ import annotations

import json
from collections.abc import Callable

SecretProvider = Callable[[str], str]


def aws_secrets_manager_provider(region_name: str = "us-east-1") -> SecretProvider:
    """boto3-backed provider (mirrors main.py:31-54: SecretString or
    binary). Import-gated: the container has no boto3/network."""

    def provider(secret_name: str) -> str:
        try:
            import boto3  # noqa: PLC0415
        except ImportError as exc:  # pragma: no cover
            raise RuntimeError("boto3 not available in this environment") from exc
        client = boto3.session.Session().client(
            service_name="secretsmanager", region_name=region_name
        )
        resp = client.get_secret_value(SecretId=secret_name)
        if "SecretString" in resp:
            return resp["SecretString"]
        import base64  # noqa: PLC0415

        return base64.b64decode(resp["SecretBinary"]).decode("utf-8")

    return provider


def static_provider(secrets: dict[str, dict | str]) -> SecretProvider:
    """Test/dev provider: secrets from a dict."""

    def provider(secret_name: str) -> str:
        v = secrets[secret_name]
        return v if isinstance(v, str) else json.dumps(v)

    return provider


def kafka_options_from_secret(
    provider: SecretProvider,
    secret_name: str = "odni-msk-rest-proxy",
    topic: str = "test-topic",
    **kw,
) -> dict[str, str]:
    """Fetch the MSK secret and build consumer options from it — closing
    the loop the reference left open (it fetched the secret then hardcoded
    the values, main.py:71,87,92). Expected keys: MSK_BROKERS, MSK_USER,
    MSK_PASSWORD."""
    from odni_apache_beam_consumer_spark.sources.kafka import msk_scram_options

    secret = json.loads(provider(secret_name))
    return msk_scram_options(
        bootstrap_servers=secret["MSK_BROKERS"],
        username=secret["MSK_USER"],
        password=secret["MSK_PASSWORD"],
        topic=topic,
        **kw,
    )
