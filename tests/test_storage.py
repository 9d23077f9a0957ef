"""Storage: routing, handles, quota, async lifecycle."""

import pytest

from bonnie32_tpu import storage as sto


def test_local_roundtrip(tmp_path):
    local = sto.LocalStorage(str(tmp_path))
    s = sto.Storage(local=local)
    assert s.mode() == sto.StorageMode.LOCAL
    assert s.is_sync("levels/foo.ron")

    s.write_string_sync("levels/foo.ron", "hello")
    assert s.exists_sync("levels/foo.ron")
    assert s.read_string_sync("levels/foo.ron") == "hello"
    assert s.list_sync("levels") == ["foo.ron"]
    s.delete_sync("levels/foo.ron")
    assert not s.exists_sync("levels/foo.ron")
    # delete of missing file is OK (local.rs:99)
    s.delete_sync("levels/foo.ron")
    # read of missing raises NotFound
    with pytest.raises(sto.StorageError) as ei:
        s.read_sync("levels/foo.ron")
    assert ei.value.kind == "NotFound"


def test_userdata_routing(tmp_path):
    s = sto.Storage(local=sto.LocalStorage(str(tmp_path)))
    assert sto.Storage.is_userdata_path("assets/userdata/levels/a.ron")
    assert not sto.Storage.is_userdata_path("assets/samples/levels/a.ron")
    # without cloud: userdata falls through to local (native semantics)
    s.write_sync("assets/userdata/x.bin", b"123")
    assert s.read_sync("assets/userdata/x.bin") == b"123"

    # with cloud: userdata routes to cloud, others stay local
    s.update_for_auth(True)
    assert s.mode() == sto.StorageMode.CLOUD
    assert not s.is_sync("assets/userdata/x.bin")
    h = s.write("assets/userdata/y.bin", b"cloud!")
    h.wait()
    assert s.read("assets/userdata/y.bin").wait() == b"cloud!"
    # non-userdata path still local and synchronous
    s.write_sync("levels/z.bin", b"local")
    assert s.is_sync("levels/z.bin")
    assert s.read_sync("levels/z.bin") == b"local"
    # detaching cloud falls back to the local copy of x.bin
    s.update_for_auth(False)
    assert not s.has_cloud()
    assert s.read_sync("assets/userdata/x.bin") == b"123"


def test_cloud_quota_and_size_caps():
    cloud = sto.CloudStorage()
    # file too large -> immediate error (gcp.rs:271)
    h = cloud.write("assets/userdata/big.bin", b"x" * (sto.MAX_FILE_SIZE + 1))
    assert h.is_ready()
    with pytest.raises(sto.StorageError) as ei:
        h.take()
    assert ei.value.kind == "FileTooLarge"

    # fill quota with 11 x 100KiB files: the 11th exceeds 1 MiB
    for i in range(10):
        cloud.write(f"assets/userdata/f{i}", b"x" * sto.MAX_FILE_SIZE).wait()
    assert cloud.quota_used() == 10 * sto.MAX_FILE_SIZE
    h = cloud.write("assets/userdata/f10", b"x" * sto.MAX_FILE_SIZE)
    with pytest.raises(sto.StorageError) as ei:
        h.wait()
    assert ei.value.kind == "QuotaExceeded"
    assert not cloud.can_write() or cloud.quota_used() < sto.USER_QUOTA


def test_cloud_pending_lifecycle():
    backend = sto.MemoryCloudBackend(latency_s=0.05)
    cloud = sto.CloudStorage(backend)
    h = cloud.write("assets/userdata/slow.bin", b"abc")
    # genuinely async: still pending right after dispatch
    assert h.poll() in (sto.StorageStatus.PENDING, sto.StorageStatus.READY)
    h.wait()
    assert h.poll() == sto.StorageStatus.READY
    files = cloud.list("assets/userdata").wait()
    assert files == ["slow.bin"]
    assert cloud.exists("assets/userdata/slow.bin").wait()
    cloud.delete("assets/userdata/slow.bin").wait()
    assert not cloud.exists("assets/userdata/slow.bin").wait()
    # read of missing -> NotFound error status
    h = cloud.read("assets/userdata/slow.bin")
    with pytest.raises(sto.StorageError):
        h.wait()
    assert h.poll() == sto.StorageStatus.ERROR


def test_async_ops(tmp_path):
    p = str(tmp_path / "deep" / "file.bin")
    save = sto.save_async(p, b"payload")
    assert save.wait() is True
    load = sto.load_async(p)
    assert load.wait() == b"payload"
    lst = sto.list_async(str(tmp_path / "deep"))
    assert lst.wait() == ["file.bin"]
    bad = sto.load_async(str(tmp_path / "nope"))
    with pytest.raises(OSError):
        bad.wait()


def test_handle_take_semantics():
    h = sto.StorageHandle.pending()
    assert h.is_pending() and h.take() is None
    h._resolve(42)
    assert h.take() == 42
    err = sto.StorageHandle.error(sto.StorageError.auth_required())
    assert err.is_ready()
    with pytest.raises(sto.StorageError) as ei:
        err.take()
    assert ei.value.kind == "AuthRequired"

# ---------------------------------------------------------------------------
# HTTP cloud transport (gcp.rs:342-520 native REST client) against a local
# server, the same pattern test_auth uses for its callback server
# ---------------------------------------------------------------------------

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from bonnie32_tpu.storage.cloud import (CloudStorage, HttpCloudBackend,
                                        MAX_FILE_SIZE, USER_QUOTA)
from bonnie32_tpu.storage.core import StorageError


class _FakeCloudAPI(BaseHTTPRequestHandler):
    """Implements the Cloud Run storage protocol: /list /get /upload
    /delete /quota with bearer auth, 404/429 and quota errors."""

    store: dict = {}
    rate_limit_next = False
    quota_next = False

    def log_message(self, *a):
        pass

    def _reply(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _auth_ok(self):
        return self.headers.get("Authorization") == "Bearer tok123"

    def _common(self):
        if not self._auth_ok():
            self._reply(401, {"success": False})
            return False
        if _FakeCloudAPI.rate_limit_next:
            _FakeCloudAPI.rate_limit_next = False
            self._reply(429, {"success": False})
            return False
        return True

    def do_GET(self):
        if not self._common():
            return
        from urllib.parse import urlparse, parse_qs, unquote
        u = urlparse(self.path)
        q = parse_qs(u.query)
        if u.path == "/quota":
            used = sum(len(v) for v in self.store.values())
            self._reply(200, {"success": True, "data": {
                "used_bytes": used, "max_bytes": USER_QUOTA}})
        elif u.path == "/list":
            prefix = unquote(q.get("prefix", [""])[0])
            files = [{"path": k, "size": len(v)}
                     for k, v in sorted(self.store.items())
                     if k.startswith(prefix)]
            self._reply(200, {"success": True,
                              "data": {"files": files, "count": len(files)}})
        elif u.path == "/get":
            path = unquote(q.get("path", [""])[0])
            if path not in self.store:
                self._reply(404, {"success": False})
                return
            self._reply(200, {"success": True, "data": {
                "path": path,
                "content": base64.b64encode(self.store[path]).decode(),
                "size": len(self.store[path])}})
        else:
            self._reply(404, {"success": False})

    def do_POST(self):
        if not self._common():
            return
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n).decode() or "{}")
        if self.path == "/upload":
            if _FakeCloudAPI.quota_next:
                _FakeCloudAPI.quota_next = False
                self._reply(507, {"success": False,
                                  "error": "user quota exceeded"})
                return
            self.store[body["path"]] = base64.b64decode(body["content"])
            self._reply(200, {"success": True, "data": {}})
        elif self.path == "/delete":
            self.store.pop(body["path"], None)
            self._reply(200, {"success": True, "data": {}})
        else:
            self._reply(404, {"success": False})


@pytest.fixture
def cloud_server():
    _FakeCloudAPI.store = {}
    _FakeCloudAPI.rate_limit_next = False
    _FakeCloudAPI.quota_next = False
    srv = HTTPServer(("127.0.0.1", 0), _FakeCloudAPI)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()
    thread.join(timeout=2)


def test_http_backend_roundtrip(cloud_server):
    be = HttpCloudBackend(cloud_server, token_provider=lambda: "tok123")
    be.put("assets/userdata/a.ron", b"hello world")
    be.put("assets/userdata/b.ron", b"\x00\xff" * 100)
    assert be.get("assets/userdata/a.ron") == b"hello world"
    assert be.list_keys("assets/userdata/") == [
        "assets/userdata/a.ron", "assets/userdata/b.ron"]
    q = be.quota()
    assert q["used"] == 11 + 200 and q["limit"] == USER_QUOTA
    be.delete("assets/userdata/a.ron")
    assert be.list_keys("assets/userdata/") == ["assets/userdata/b.ron"]


def test_http_backend_error_mapping(cloud_server):
    be = HttpCloudBackend(cloud_server, token_provider=lambda: "tok123")
    # 404 -> NotFound
    with pytest.raises(StorageError) as e:
        be.get("missing.ron")
    assert e.value.kind == "NotFound"
    # 429 -> RateLimited
    _FakeCloudAPI.rate_limit_next = True
    with pytest.raises(StorageError) as e:
        be.get("whatever")
    assert e.value.kind == "RateLimited"
    # quota body -> QuotaExceeded
    _FakeCloudAPI.quota_next = True
    with pytest.raises(StorageError) as e:
        be.put("x.ron", b"data")
    assert e.value.kind == "QuotaExceeded"
    # bad/missing token -> AuthRequired (server 401)
    bad = HttpCloudBackend(cloud_server, token_provider=lambda: "nope")
    with pytest.raises(StorageError) as e:
        bad.get("a")
    assert e.value.kind == "AuthRequired"
    # empty token short-circuits without a request (gcp.rs:350)
    anon = HttpCloudBackend(cloud_server)
    with pytest.raises(StorageError) as e:
        anon.get("a")
    assert e.value.kind == "AuthRequired"


def test_cloud_storage_over_http_backend(cloud_server):
    """CloudStorage's quota preflight + handles work over the REST
    transport (fire-and-poll, gcp.rs:269-292)."""
    be = HttpCloudBackend(cloud_server, token_provider=lambda: "tok123")
    cs = CloudStorage(backend=be)
    h = cs.write("assets/userdata/doc.ron", b"payload")
    h.wait()
    assert cs.read("assets/userdata/doc.ron").wait() == b"payload"
    assert cs.list("assets/userdata").wait() == ["doc.ron"]
    assert cs.exists("assets/userdata/doc.ron").wait() is True
    assert cs.exists("assets/userdata/nope.ron").wait() is False
    # oversized write rejected before any request
    h = cs.write("big.bin", b"x" * (MAX_FILE_SIZE + 1))
    with pytest.raises(StorageError) as e:
        h.wait()
    assert e.value.kind == "FileTooLarge"
    # quota preflight consults the server-reported usage
    _FakeCloudAPI.store["other"] = b"y" * (USER_QUOTA - 10)
    h = cs.write("assets/userdata/more.ron", b"z" * 100)
    with pytest.raises(StorageError) as e:
        h.wait()
    assert e.value.kind == "QuotaExceeded"
