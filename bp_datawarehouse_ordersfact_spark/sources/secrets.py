"""Secret / credential provider (reference S7: ``gcp_getsecrets.py:5-44``
``get_gcp_secret(project, secret, version)`` → decoded payload).

The reference fetches every secret from GCP Secret Manager — and
re-fetches it in EVERY script of the pipeline (e.g.
``dw2_wc_increment.py:24-28``), one network round-trip per consumer per
run; SURVEY §4.2 lists that as an anti-optimization not to replicate.
This provider keeps the same lookup contract behind a resolution CHAIN
with a per-process memo, so a credential resolves once per run however
many sources ask for it:

1. **Environment override** — ``SPARK_GRAFT_SECRET_<NAME>`` (name
   upper-cased, ``-``→``_``): the dev/test/CI path, and the standard
   container-orchestrator injection shape (k8s secret → env var).
2. **Secrets directory** — ``$SPARK_GRAFT_SECRETS_DIR/<name>`` file
   payload (trailing newline stripped, as mounted secret volumes
   deliver them): the production path on any platform that mounts
   secrets as files (k8s, Docker, GCE metadata agents).
3. **GCP Secret Manager** — the reference's own backend, behind an
   import gate exactly like the BigQuery connector
   (``sources/bigquery.py``): ``google-cloud-secret-manager`` is not in
   this container, so the probe raises a clear
   ``SecretUnavailable`` naming the missing provider instead of an
   ImportError mid-pipeline. On a cluster with the library and ADC
   credentials the call runs as-is:
   ``projects/{project}/secrets/{secret}/versions/{version}``.

Secrets are CONFIG, not dataflow — nothing here touches a DataFrame —
but a complete replacement for the reference must still resolve the
credentials its sources (REST, BigQuery) need; this closes SURVEY §2.1
S7 with the engine-appropriate shape.

Security posture: payloads live only in the process memo (cleared with
``clear_secret_cache``); they are never logged, never written to disk
by this module, and ``__repr__``-safe (the memo maps to an opaque
holder).
"""

from __future__ import annotations

import os
import warnings


class _Opaque:
    """Holds one payload; its repr never prints it, so an accidental
    dump of module state (debugger watch, print(_MEMO), an exception
    reporter serializing globals) shows ``<secret>`` rather than the
    credential."""

    __slots__ = ("_value",)

    def __init__(self, value: str):
        self._value = value

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "<secret>"


_MEMO: dict[tuple[str, str, str], _Opaque] = {}


class SecretUnavailable(RuntimeError):
    """No provider in the chain could resolve the secret."""


def _env_key(secret: str) -> str:
    return "SPARK_GRAFT_SECRET_" + secret.upper().replace("-", "_")


def _warn_scope_collapse(provider: str, secret: str, project: str,
                         version: str) -> None:
    """The env and secrets-dir providers key on the SECRET NAME ONLY —
    deliberately: an injected env var / mounted file is one payload, and
    making deployers encode project+version into every variable name
    would break the standard k8s/CI injection shape. That means lookups
    for different projects, or for a pinned non-``latest`` version,
    COLLAPSE to the same payload when served from these providers
    (r12 ADVICE #3) — only the GCP provider honors the full
    project/version-scoped ``get_gcp_secret`` contract
    (``gcp_getsecrets.py:5-44``). Loud, not silent: a pinned version
    served from an override warns so a rotation test can't mistake the
    env payload for the pinned one."""
    if version != "latest":
        warnings.warn(
            f"secret {secret!r}: version {version!r} requested but the "
            f"{provider} provider is name-keyed and serves its single "
            f"payload regardless of project ({project!r}) or version — "
            "pin versions only against the GCP provider",
            stacklevel=3,
        )


def get_secret(project: str, secret: str, version: str = "latest") -> str:
    """Resolve ``secret`` through the provider chain; memoized per
    (project, secret, version) for the process lifetime (the reference
    re-fetched per script — the anti-optimization SURVEY §4.2 names).

    Scope note (r12 ADVICE #3): the env/file override providers are
    name-keyed (see ``_warn_scope_collapse``) — distinct projects or a
    pinned ``version`` collapse to the one injected payload there, with
    a ``UserWarning`` when ``version != 'latest'``; full
    project/version scoping applies only on the GCP provider.

    Raises ``SecretUnavailable`` with the full chain's diagnosis when
    nothing resolves — callers never see a bare KeyError/ImportError.
    """
    key = (project, secret, version)
    if key in _MEMO:
        return _MEMO[key]._value
    tried: list[str] = []

    env_name = _env_key(secret)
    val = os.environ.get(env_name)
    if val is not None:
        _warn_scope_collapse(f"env:{env_name}", secret, project, version)
        _MEMO[key] = _Opaque(val)
        return val
    tried.append(f"env:{env_name} unset")

    sdir = os.environ.get("SPARK_GRAFT_SECRETS_DIR")
    if sdir:
        path = os.path.join(sdir, secret)
        if os.path.isfile(path):
            with open(path, "r", encoding="utf-8") as fh:
                val = fh.read().rstrip("\n")
            _warn_scope_collapse(f"file:{path}", secret, project, version)
            _MEMO[key] = _Opaque(val)
            return val
        tried.append(f"file:{path} not found")
    else:
        tried.append("dir:SPARK_GRAFT_SECRETS_DIR unset")

    try:
        from google.cloud import secretmanager  # type: ignore
    except ImportError:
        tried.append("gcp:google-cloud-secret-manager not installed")
        raise SecretUnavailable(
            f"secret {secret!r} (project {project!r}, version {version!r}) "
            f"resolved by no provider — chain: {'; '.join(tried)}. "
            "Set the env override, mount a secrets dir, or install "
            "google-cloud-secret-manager with ADC credentials."
        ) from None
    client = secretmanager.SecretManagerServiceClient()
    name = f"projects/{project}/secrets/{secret}/versions/{version}"
    payload = client.access_secret_version(request={"name": name})
    val = payload.payload.data.decode("utf-8")
    _MEMO[key] = _Opaque(val)
    return val


def clear_secret_cache() -> None:
    """Drop every memoized payload (test isolation / credential
    rotation mid-process)."""
    _MEMO.clear()
