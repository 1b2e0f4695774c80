"""REST batch sink tests (r5): a local stdlib http.server with injected
failures proves retry/backoff, idempotent re-delivery, permanent-failure
classification, and connection-reset recovery — no real network."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from ocr_ray.state.rest_sink import RestBatchSink, batch_payload, write_rest


class _Server:
    """Records deliveries keyed by Idempotency-Key; scriptable failures."""

    def __init__(self):
        self.store = {}
        self.hits = []
        self.fail_first = 0  # respond 503 to this many requests
        self.hard_fail_keys = set()  # respond 400 for these keys
        self.lock = threading.Lock()

        outer = self

        class H(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                body = self.rfile.read(n)
                key = self.headers["Idempotency-Key"]
                with outer.lock:
                    outer.hits.append(key)
                    if outer.fail_first > 0:
                        outer.fail_first -= 1
                        self.send_response(503)
                        self.end_headers()
                        return
                    if key in outer.hard_fail_keys:
                        self.send_response(400)
                        self.end_headers()
                        return
                    if key in outer.store:
                        self.send_response(409)  # already committed
                        self.end_headers()
                        return
                    outer.store[key] = json.loads(body)
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}/ingest"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def server():
    s = _Server()
    yield s
    s.close()


def _batch(ids):
    return pa.table({"id": pa.array(ids, pa.int64()), "v": [f"r{i}" for i in ids]})


class TestSinkActor:
    def test_clean_delivery(self, server):
        sink = RestBatchSink(server.url)
        out = sink(_batch([1, 2, 3]))
        assert out.column("status")[0].as_py() == "ok"
        assert out.column("attempts")[0].as_py() == 1
        key = out.column("idempotency_key")[0].as_py()
        assert [r["id"] for r in server.store[key]] == [1, 2, 3]

    def test_retry_then_success(self, server):
        server.fail_first = 2
        sink = RestBatchSink(server.url, base_delay_s=0.005)
        out = sink(_batch([7]))
        assert out.column("status")[0].as_py() == "ok"
        assert out.column("attempts")[0].as_py() == 3

    def test_idempotent_redelivery(self, server):
        sink = RestBatchSink(server.url)
        b = _batch([4, 5])
        k1 = sink(b).column("idempotency_key")[0].as_py()
        out2 = sink(b)  # resumed run re-sends the identical batch
        assert out2.column("idempotency_key")[0].as_py() == k1
        assert out2.column("status")[0].as_py() == "duplicate"
        assert len(server.store) == 1  # committed exactly once

    def test_permanent_4xx_not_retried(self, server):
        b = _batch([9])
        _, key = batch_payload(b)
        server.hard_fail_keys.add(key)
        sink = RestBatchSink(server.url, base_delay_s=0.005)
        out = sink(b)
        assert out.column("status")[0].as_py() == "failed:400"
        assert out.column("attempts")[0].as_py() == 1

    def test_retries_exhausted(self, server):
        server.fail_first = 99
        sink = RestBatchSink(server.url, max_attempts=3, base_delay_s=0.002)
        out = sink(_batch([1]))
        assert out.column("status")[0].as_py() == "failed:retries_exhausted"
        assert out.column("attempts")[0].as_py() == 3

    def test_connection_reset_recovers(self, server):
        sink = RestBatchSink(server.url, base_delay_s=0.005)
        assert sink(_batch([1])).column("status")[0].as_py() == "ok"
        # poison the kept-alive socket; next call must rebuild and succeed
        sink._conn.close()
        assert sink(_batch([2])).column("status")[0].as_py() == "ok"

    def test_key_is_content_addressed(self):
        b1, b2 = _batch([1, 2]), _batch([1, 2])
        assert batch_payload(b1)[1] == batch_payload(b2)[1]
        assert batch_payload(_batch([3]))[1] != batch_payload(b1)[1]


class TestDatasetIntegration:
    def test_write_rest_streams_all_batches(self, server, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(_batch(list(range(100))))
        lineage = write_rest(ds, server.url, batch_size=16).take_all()
        assert all(r["status"] == "ok" for r in lineage)
        assert sum(r["rows"] for r in lineage) == 100
        got = sorted(r["id"] for rows in server.store.values() for r in rows)
        assert got == list(range(100))
