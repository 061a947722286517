"""Paginated REST ingestion (reference S1/S2: WooCommerce /products and
/orders pulls, ``dw2_wc_increment.py:37-69,122-189``).

Two shapes, chosen by catalog size:

- ``fetch_pages_driver``: the reference's shape — a driver-side page loop
  building one DataFrame. Right when the source is small (the reference
  pulls O(10²-10³) records per run).
- ``fetch_pages_distributed``: the 100 TB shape — page numbers become a
  DataFrame, ``mapInPandas`` fetches pages inside executors (parallel,
  Arrow-batched, no driver bottleneck, and the result lands already
  partitioned).

Both take the page-fetch function as an argument: in production it wraps
``requests`` with auth; tests inject a deterministic fake (this container
has no network — the transport is the ONLY stubbed piece; pagination,
windowing, schema and partitioning are the real implementation).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# A fetcher takes (page, per_page, window_start, window_end) and returns
# the page's records as a list of JSON-serializable dicts.
Fetcher = Callable[[int, int, str | None, str | None], list[dict]]


def fetch_pages_driver(
    spark: SparkSession,
    fetcher: Fetcher,
    schema: T.StructType,
    n_pages: int,
    per_page: int = 100,
    window_start: str | None = None,
    window_end: str | None = None,
) -> DataFrame:
    """S1/S2 driver-side loop (reference accumulates page dicts then
    builds one frame — ``dw2_wc_increment.py:161-189``). The date window
    is the incremental re-pull (61 days in the reference,
    ``dw2_wc_increment.py:125,132-141``)."""
    rows: list[dict] = []
    for page in range(1, n_pages + 1):
        rows.extend(fetcher(page, per_page, window_start, window_end))
    return spark.createDataFrame(rows, schema)


def fetch_pages_distributed(
    spark: SparkSession,
    fetcher: Fetcher,
    schema: T.StructType,
    n_pages: int,
    per_page: int = 100,
    window_start: str | None = None,
    window_end: str | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Scale shape: ``spark.range(pages) → repartition → mapInPandas``
    fetcher. Each executor task pulls its page range; records are parsed
    against the explicit schema via ``from_json`` (JVM-side), so the
    Python worker only moves raw strings."""
    import pandas as pd

    par = parallelism or spark.sparkContext.defaultParallelism
    pages = spark.range(1, n_pages + 1).toDF("page").repartition(par)

    def pull(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            payloads = []
            for page in pdf["page"]:
                for rec in fetcher(int(page), per_page, window_start, window_end):
                    payloads.append(json.dumps(rec))
            yield pd.DataFrame({"raw": payloads})

    raw = pages.mapInPandas(pull, schema="raw string")
    return raw.select(
        F.from_json("raw", schema).alias("rec")
    ).select("rec.*")


def with_retries(
    fetcher: Fetcher,
    max_attempts: int = 5,
    base_delay_s: float = 0.5,
    max_delay_s: float = 30.0,
    retryable: Callable[[Exception], bool] = lambda _: True,
    sleep: Callable[[float], None] | None = None,
) -> Fetcher:
    """Wrap a page fetcher with exponential-backoff retries — the
    resilience layer a production pull needs against 429/5xx/transient
    network failures (the reference has none: one failed page kills the
    whole ``dw2`` run).

    Transport-agnostic like everything in this module: ``retryable``
    classifies exceptions (e.g. retry 429/503, fail fast on 401), and an
    exception carrying a ``retry_after_s`` attribute (set by the
    transport from a ``Retry-After`` header) overrides the computed
    backoff for that attempt. Backoff is DETERMINISTIC (pure doubling,
    capped) — no random jitter, so distributed replays are reproducible;
    at scale, workers are already decorrelated because each retries its
    own page on its own failure clock.

    Composes with both shapes: decorate once, pass to either
    ``fetch_pages_driver`` or ``fetch_pages_distributed`` (the wrapper
    is serialized to executors with the fetcher closure)."""
    if max_attempts < 1:
        raise ValueError("max_attempts must be >= 1")
    if sleep is None:
        import time

        sleep = time.sleep

    def wrapped(page, per_page, window_start, window_end):
        for attempt in range(1, max_attempts + 1):
            try:
                return fetcher(page, per_page, window_start, window_end)
            except Exception as ex:
                if attempt == max_attempts or not retryable(ex):
                    raise
                hint = getattr(ex, "retry_after_s", None)
                if hint is not None:
                    # honor the server's instruction UNCAPPED: sleeping
                    # less than Retry-After retries into a still-closed
                    # rate window and escalates throttling
                    sleep(float(hint))
                else:
                    sleep(min(max_delay_s, base_delay_s * (2 ** (attempt - 1))))

    return wrapped


def make_wc_fetcher(
    base_url: str,
    endpoint: str,
    *,
    project: str = "",
    key_secret: str = "wc-consumer-key",
    secret_secret: str = "wc-consumer-secret",
    transport=None,
    timeout_s: float = 30.0,
    auth_mode: str = "basic",
) -> Fetcher:
    """Production ``Fetcher`` for the WooCommerce-shaped API (reference
    S1/S2), with credentials resolved through the S7 provider chain
    (``sources/secrets.get_secret`` — env override in dev/CI, mounted
    secrets dir or Secret Manager in production; resolved ONCE here,
    not per page, and never embedded in the returned closure's repr).

    Credential transport — a DELIBERATE divergence from the reference
    by default (r12 ADVICE #5): the reference passes
    ``consumer_key``/``consumer_secret`` as QUERY PARAMETERS
    (``dw2_wc_increment.py:145-150``), which leaks credentials into
    access logs, proxies, and browser history; ``auth_mode="basic"``
    (default) sends them as HTTP Basic auth instead — equivalent for
    WooCommerce over HTTPS and safer for logs. Hosts that strip the
    ``Authorization`` header (some CDN/proxy chains) break under Basic:
    ``auth_mode="query"`` restores the reference's exact wire shape for
    them.

    ``transport`` is any object with a ``get(url, params=, auth=,
    timeout=) -> response`` method (``requests`` by default, imported
    behind a gate since this container has no network; tests inject a
    fake). The returned fetcher is pure transport — compose with
    ``with_retries`` for the backoff policy and hand it to either
    ``fetch_pages_driver`` or ``fetch_pages_distributed``.

    Page/window parameters mirror the reference exactly: ``page``,
    ``per_page``, and the ``after``/``before`` ISO date window of the
    incremental orders pull (``dw2_wc_increment.py:125,132-141``).
    """
    from .secrets import get_secret

    if auth_mode not in ("basic", "query"):
        raise ValueError(
            f"auth_mode must be 'basic' or 'query', got {auth_mode!r}"
        )
    auth = (
        get_secret(project, key_secret),
        get_secret(project, secret_secret),
    )
    if transport is None:
        try:
            import requests as transport  # type: ignore
        except ImportError as ex:
            raise RuntimeError(
                "no transport injected and `requests` is not installed — "
                "pass transport= (any object with .get(url, params=, "
                "auth=, timeout=))"
            ) from ex
    url = base_url.rstrip("/") + "/" + endpoint.lstrip("/")

    def fetcher(page, per_page, window_start, window_end):
        params = {"page": page, "per_page": per_page}
        if window_start is not None:
            params["after"] = window_start
        if window_end is not None:
            params["before"] = window_end
        if auth_mode == "query":
            # the reference's exact wire shape (dw2_wc_increment.py:145-150)
            params["consumer_key"], params["consumer_secret"] = auth
            resp = transport.get(url, params=params, timeout=timeout_s)
        else:
            resp = transport.get(
                url, params=params, auth=auth, timeout=timeout_s
            )
        resp.raise_for_status()
        return resp.json()

    return fetcher
