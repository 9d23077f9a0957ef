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