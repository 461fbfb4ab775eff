"""Paginated REST source adapters (SURVEY.md §2.1 S1-S10).

The reference's extractors are hand-rolled per-API pagination loops
(cursor: tiktok_shop_extractor.py:42-158; page-token: :160-296;
page-index: misa_crm_extractor.py:344-483; time-chunked:
shopee_orders_extractor.py:593-736). Here they collapse into one
generic ``PaginatedApiSource`` parameterized by a ``PageSpec``:

- pushdown: the time window and projection field list are passed into
  the request parameters (the reference's O1/O2 "optimizations" — for an
  API source, predicate/projection pushdown IS request parameterization);
- pagination strategies: ``cursor`` (opaque token + has-more flag),
  ``page_token`` (token only), ``page_index`` (stop on short page);
- detail-batch lookup (S4/S6): id list fanned out in fixed-size batches
  — the semi-join shape, with per-batch projection pushdown;
- chunked windows (S7): a [start, end) range split into max-N-day chunks
  with cross-page dedup by key (dropDuplicates downstream);
- rate limiting + bounded retry with linear backoff (O11).

Transport is injected (``fetch_fn``): tests and this container use fake
fetchers; a real deployment passes an HTTP client. Landing protocol for
Spark: ``to_dataframe`` parallelizes the JSON records onto the cluster
with an explicit schema — for large backfills, ``land_jsonl`` writes
newline-JSON for ``spark.read.json`` (schema-on-read, splittable).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class PageSpec:
    """How one endpoint paginates and takes pushdown parameters."""

    strategy: str  # 'cursor' | 'page_token' | 'page_index'
    page_size: int = 100
    page_size_param: str = "page_size"
    cursor_param: str = "cursor"
    cursor_field: str = "next_cursor"
    more_field: str = "more"
    records_field: str = "records"
    max_pages: int = 50_000
    # pushdown parameter names (None -> not supported by this endpoint)
    window_start_param: str | None = None
    window_end_param: str | None = None
    fields_param: str | None = None


@dataclass
class PaginatedApiSource:
    fetch_fn: Callable[[str, dict], dict]
    spec: PageSpec
    endpoint: str
    rate_limit_s: float = 0.0
    max_retries: int = 3
    backoff_s: float = 0.5
    on_auth_error: Callable[[], None] | None = None
    extra_params: dict = field(default_factory=dict)

    def _fetch(self, params: dict) -> dict:
        last = None
        for attempt in range(self.max_retries):
            try:
                return self.fetch_fn(self.endpoint, params)
            except PermissionError:
                # 401-equivalent: refresh token once, retry (S11,
                # misa_crm_extractor.py:295-342)
                if self.on_auth_error is not None:
                    self.on_auth_error()
                last = PermissionError("auth retry exhausted")
            except Exception as e:  # bounded linear backoff (O11)
                last = e
                time.sleep(self.backoff_s * (attempt + 1))
        raise last

    def pages(
        self,
        window: tuple | None = None,
        fields: Sequence[str] | None = None,
        params: dict | None = None,
    ) -> Iterator[list[dict]]:
        """Generator of record batches (streaming, anti-OOM — parity with
        the reference's generator extraction, tiktok_shop_extractor.py:42-158).
        ``window``/``fields`` are pushed into the request (O1/O2)."""
        p = dict(self.extra_params)
        if params:
            p.update(params)
        p[self.spec.page_size_param] = self.spec.page_size
        if window is not None and self.spec.window_start_param:
            p[self.spec.window_start_param] = window[0]
            if self.spec.window_end_param:
                p[self.spec.window_end_param] = window[1]
        if fields is not None and self.spec.fields_param:
            p[self.spec.fields_param] = ",".join(fields)

        if self.spec.strategy == "page_index":
            page = 1
            while page <= self.spec.max_pages:
                resp = self._fetch({**p, "page": page})
                recs = resp.get(self.spec.records_field) or []
                if recs:
                    yield recs
                if len(recs) < self.spec.page_size:  # short page -> done
                    return
                page += 1
                if self.rate_limit_s:
                    time.sleep(self.rate_limit_s)
            return

        cursor = None
        for _ in range(self.spec.max_pages):
            q = dict(p)
            if cursor is not None:
                q[self.spec.cursor_param] = cursor
            resp = self._fetch(q)
            recs = resp.get(self.spec.records_field) or []
            if recs:
                yield recs
            cursor = resp.get(self.spec.cursor_field)
            if self.spec.strategy == "cursor":
                if not resp.get(self.spec.more_field):
                    return
            elif not cursor:  # page_token: empty token -> done
                return
            if self.rate_limit_s:
                time.sleep(self.rate_limit_s)

    def fetch_details(
        self,
        ids: Sequence,
        batch_size: int,
        ids_param: str = "ids",
        fields: Sequence[str] | None = None,
    ) -> Iterator[list[dict]]:
        """S4/S6 point-lookup join: id list -> batched detail requests
        (batch caps are API constraints: 50 TikTok / 15 Shopee)."""
        p: dict = {}
        if fields is not None and self.spec.fields_param:
            p[self.spec.fields_param] = ",".join(fields)
        for i in range(0, len(ids), batch_size):
            resp = self._fetch({**p, ids_param: list(ids[i:i + batch_size])})
            yield resp.get(self.spec.records_field) or []
            if self.rate_limit_s:
                time.sleep(self.rate_limit_s)

    def chunked_windows(
        self, start: int, end: int, max_span: int
    ) -> list[tuple[int, int]]:
        """S7 range chunking (Shopee <= 10-day API limit,
        shopee_orders_extractor.py:611-623)."""
        out = []
        lo = start
        while lo < end:
            hi = min(lo + max_span, end)
            out.append((lo, hi))
            lo = hi
        return out


def to_dataframe(
    spark: SparkSession,
    batches: Iterator[list[dict]],
    schema: T.StructType,
    slice_size: int = 5000,
    normalizer: Callable[[dict], dict] | None = None,
) -> DataFrame:
    """Land batches as a DataFrame with a declared schema. JSON round-trip
    so nested dicts parse through the schema (unknown keys tolerated).
    ``normalizer`` runs per record pre-landing (e.g. the Shopee
    list-or-scalar fix, platforms.normalize_shopee_order)."""
    if normalizer is None:
        lines = [json.dumps(r) for batch in batches for r in batch]
    else:
        lines = [json.dumps(normalizer(r)) for batch in batches for r in batch]
    if not lines:
        return spark.createDataFrame([], schema)
    n_slices = max(1, len(lines) // slice_size)
    return spark.read.schema(schema).json(
        spark.sparkContext.parallelize(lines, n_slices)
    )


def land_jsonl(batches: Iterator[list[dict]], path: str) -> int:
    """Large-backfill landing: newline-JSON file for spark.read.json
    (the scalable path — the Parquet/XCom handoff of the reference's full
    load, dags/full_load_etl_dag.py:233-251, minus the driver memory)."""
    n = 0
    with open(path, "w") as f:
        for batch in batches:
            for r in batch:
                f.write(json.dumps(r) + "\n")
                n += 1
    return n
