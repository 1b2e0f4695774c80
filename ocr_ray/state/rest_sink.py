"""Retrying, idempotent REST batch sink (r5 — the live-connector analog).

The reference app commits extraction results to external services over
HTTP — MongoDB via an API route (``src/app/api/save-to-mongodb/
route.ts:124-127``) and Google Sheets (``save-to-google-sheet.ts``) — with
none of the delivery hardening a 10^12-row pipeline needs. This module is
the Ray-native counterpart: a ``map_batches`` actor stage that POSTs
JSON-serialized row batches to an endpoint with

  * per-batch IDEMPOTENCY KEYS derived from the batch content (sha256 of
    the canonical JSON), sent as the ``Idempotency-Key`` header so an
    at-least-once retry storm commits each batch exactly once server-side
    (HTTP 409 from the server = "already have it" and counts as success);
  * bounded exponential backoff with DETERMINISTIC jitter (keyed by the
    idempotency key — no wall-clock RNG) for 5xx and connection errors;
  * 4xx (other than 409/429) treated as permanent: the batch is reported
    in the result stream with ``status='failed'`` instead of retrying
    forever — the caller decides whether a partial commit aborts the job;
  * a result row PER BATCH (not per row): the shuffle-free lineage record
    (endpoint, idempotency key, rows, bytes, attempts, status) that a
    resume pass can reconcile against the server, mirroring the Parquet
    sink's manifest contract.

Scale shape: the stage is embarrassingly parallel; per-actor state is one
persistent ``http.client`` connection (the A6 cached-connection analog).
Batch size bounds both request payload and retry amplification. The tests
drive it against a local ``http.server`` that injects failures; no real
network is needed or used.
"""

from __future__ import annotations

import hashlib
import json
import time
from urllib.parse import urlsplit

import pyarrow as pa

_RETRYABLE = {429, 500, 502, 503, 504}


def batch_payload(batch: pa.Table) -> tuple[bytes, str]:
    """(canonical JSON bytes, idempotency key) for a row batch. The JSON
    is row-major with sorted keys and no float formatting surprises
    (ints/strings only is the caller's contract for exactness); the key
    is the sha256 of the payload, so identical batches — e.g. a resumed
    run re-sending — carry the same key."""
    rows = batch.to_pylist()
    body = json.dumps(rows, sort_keys=True, separators=(",", ":")).encode("utf-8")
    return body, hashlib.sha256(body).hexdigest()


class RestBatchSink:
    """Actor-pool stage: POST each batch, return one lineage row per batch.

    ``max_attempts`` bounds the retry loop; ``base_delay_s`` the backoff
    start (delays: base * 2^k, plus a deterministic 0-25% jitter from the
    idempotency key so synchronized workers don't retry in lockstep).
    """

    def __init__(
        self,
        endpoint: str,
        *,
        max_attempts: int = 5,
        base_delay_s: float = 0.05,
        timeout_s: float = 10.0,
    ):
        import http.client

        self.endpoint = endpoint
        self.max_attempts = max_attempts
        self.base_delay_s = base_delay_s
        self.timeout_s = timeout_s
        u = urlsplit(endpoint)
        if u.scheme != "http":
            raise ValueError("RestBatchSink supports http:// endpoints")
        self._host = u.hostname or "localhost"
        self._port = u.port or 80
        self._path = u.path or "/"
        self._http = http.client
        self._conn = None  # lazy; rebuilt on connection errors

    def _connection(self):
        if self._conn is None:
            self._conn = self._http.HTTPConnection(
                self._host, self._port, timeout=self.timeout_s
            )
        return self._conn

    def _post_once(self, body: bytes, key: str) -> int:
        conn = self._connection()
        try:
            conn.request(
                "POST",
                self._path,
                body=body,
                headers={
                    "Content-Type": "application/json",
                    "Idempotency-Key": key,
                    "Content-Length": str(len(body)),
                },
            )
            resp = conn.getresponse()
            resp.read()  # drain so the connection can be reused
            return resp.status
        except (ConnectionError, OSError, self._http.HTTPException):
            # poisoned keep-alive connection: drop it and surface as retryable
            try:
                conn.close()
            finally:
                self._conn = None
            return -1

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "idempotency_key": pa.array([], pa.string()),
                    "rows": pa.array([], pa.int64()),
                    "bytes": pa.array([], pa.int64()),
                    "attempts": pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                }
            )
        body, key = batch_payload(batch)
        # deterministic jitter in [0, 0.25): top 20 key bits / 2^20 / 4
        jitter = int(key[:5], 16) / (16**5) / 4.0
        attempts = 0
        status = "failed"
        while attempts < self.max_attempts:
            attempts += 1
            code = self._post_once(body, key)
            if 200 <= code < 300 or code == 409:  # 409 = already committed
                status = "ok" if code != 409 else "duplicate"
                break
            if code not in _RETRYABLE and code != -1:
                status = f"failed:{code}"
                break
            if attempts < self.max_attempts:
                time.sleep(self.base_delay_s * (2 ** (attempts - 1)) * (1.0 + jitter))
        else:
            status = "failed:retries_exhausted"
        return pa.table(
            {
                "idempotency_key": pa.array([key], pa.string()),
                "rows": pa.array([batch.num_rows], pa.int64()),
                "bytes": pa.array([len(body)], pa.int64()),
                "attempts": pa.array([attempts], pa.int64()),
                "status": pa.array([status], pa.string()),
            }
        )


def write_rest(
    ds,
    endpoint: str,
    *,
    batch_size: int = 512,
    concurrency: tuple[int, int] = (1, 8),
    max_attempts: int = 5,
    base_delay_s: float = 0.05,
):
    """Stream a Dataset into a REST endpoint; returns the per-batch
    lineage Dataset (consume it — e.g. ``take_all()`` on the tiny result —
    to drive the writes and inspect delivery status)."""
    return ds.map_batches(
        RestBatchSink,
        fn_constructor_args=(endpoint,),
        fn_constructor_kwargs={
            "max_attempts": max_attempts,
            "base_delay_s": base_delay_s,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
