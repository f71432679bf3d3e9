"""Download/archive toolkit (utils/downloads.py) vs the reference's
downloads.py doctrine: zip/unzip top-level handling, retrying safe_download
with min-byte validation, disk-space guard, threaded multi-URL download,
asset resolution. All network traffic stays on a live in-process HTTP
server / file:// URLs (zero-egress)."""

import http.server
import threading
import zipfile
from pathlib import Path

import pytest

from yolo_sod_tpu.utils.downloads import (attempt_download_asset,
                                          check_disk_space, download, is_url,
                                          safe_download, unzip_file,
                                          url_content_length, zip_directory)


@pytest.fixture()
def http_root(tmp_path):
    """Serve tmp_path/www over a local HTTP server; first GET of any path
    containing 'flaky' returns 500 (to exercise the retry loop)."""
    root = tmp_path / "www"
    root.mkdir()
    failed_once = set()

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def do_GET(self):
            if "flaky" in self.path and self.path not in failed_once:
                failed_once.add(self.path)
                self.send_error(500, "transient")
                return
            super().do_GET()

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_is_url():
    assert is_url("http://example.com/x.zip")
    assert is_url("file:///tmp/x.zip")
    assert not is_url("not a url")
    assert not is_url("/plain/path.zip")


def test_zip_unzip_roundtrip_with_top_level_dir(tmp_path):
    src = tmp_path / "coco8"
    (src / "images").mkdir(parents=True)
    (src / "images" / "a.txt").write_text("A")
    (src / "labels.txt").write_text("L")
    (src / ".DS_Store").write_text("junk")

    z = zip_directory(src, progress=False)
    assert z == src.with_suffix(".zip") and z.exists()
    names = zipfile.ZipFile(z).namelist()
    assert all(n.startswith("coco8/") for n in names)
    assert not any(".DS_Store" in n for n in names)

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    dest = unzip_file(z, path=out_dir, progress=False)
    # single top-level dir extracts INTO path (reference unzip_file :170-177)
    assert dest == out_dir / "coco8"
    assert (dest / "images" / "a.txt").read_text() == "A"

    # non-empty destination skips without exist_ok
    (dest / "images" / "a.txt").write_text("MODIFIED")
    dest2 = unzip_file(z, path=out_dir, progress=False)
    assert (dest2 / "images" / "a.txt").read_text() == "MODIFIED"
    unzip_file(z, path=out_dir, exist_ok=True, progress=False)
    assert (dest / "images" / "a.txt").read_text() == "A"


def test_unzip_flat_archive_wraps_in_stem_dir(tmp_path):
    z = tmp_path / "flat.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("a.txt", "1")
        zf.writestr("b.txt", "2")
    dest = unzip_file(z, path=tmp_path, progress=False)
    assert dest == tmp_path / "flat"
    assert (dest / "a.txt").exists() and (dest / "b.txt").exists()


def test_safe_download_http_and_retry(http_root, tmp_path):
    root, base = http_root
    (root / "weights.bin").write_bytes(b"x" * 2048)
    out = safe_download(f"{base}/weights.bin", file=tmp_path / "w.bin",
                        unzip=False, progress=False)
    assert Path(out).read_bytes() == b"x" * 2048

    # transient 500 on first request -> retry succeeds
    (root / "flaky.bin").write_bytes(b"y" * 1024)
    out = safe_download(f"{base}/flaky.bin", file=tmp_path / "f.bin",
                        unzip=False, retry=2, progress=False)
    assert Path(out).read_bytes() == b"y" * 1024

    # missing file -> ConnectionError after retries
    with pytest.raises(ConnectionError):
        safe_download(f"{base}/missing.bin", file=tmp_path / "m.bin",
                      unzip=False, retry=1, progress=False)


def test_safe_download_unzips_archives(http_root, tmp_path):
    root, base = http_root
    src = root / "ds"
    (src / "train").mkdir(parents=True)
    (src / "train" / "i.txt").write_text("img")
    zip_directory(src, progress=False)

    out = safe_download(f"{base}/ds.zip", dir=tmp_path / "datasets",
                        delete=True, progress=False)
    assert Path(out) == tmp_path / "datasets" / "ds"
    assert (Path(out) / "train" / "i.txt").read_text() == "img"
    assert not (tmp_path / "datasets" / "ds.zip").exists()   # delete=True


def test_safe_download_file_url(tmp_path):
    src = tmp_path / "asset.bin"
    src.write_bytes(b"z" * 4096)
    out = safe_download(src.as_uri(), file=tmp_path / "copy.bin", unzip=False,
                        progress=False)
    assert Path(out).read_bytes() == src.read_bytes()
    assert url_content_length(src.as_uri()) == 4096


def test_check_disk_space(tmp_path):
    src = tmp_path / "small.bin"
    src.write_bytes(b"ok")
    assert check_disk_space(src.as_uri(), path=tmp_path)
    # unknown size -> passes (0 bytes required)
    assert check_disk_space("http://127.0.0.1:1/none.bin", path=tmp_path)


def test_threaded_download(http_root, tmp_path):
    root, base = http_root
    for i in range(3):
        (root / f"part{i}.bin").write_bytes(bytes([i]) * 512)
    download([f"{base}/part{i}.bin" for i in range(3)],
             dir=tmp_path / "dl", unzip=False, threads=2)
    for i in range(3):
        assert (tmp_path / "dl" / f"part{i}.bin").read_bytes() == bytes([i]) * 512


def test_attempt_download_asset_local_and_url(tmp_path, monkeypatch, http_root):
    root, base = http_root
    local = tmp_path / "model.ckpt"
    local.write_text("weights")
    assert attempt_download_asset(local) == str(local)

    with pytest.raises(FileNotFoundError):
        attempt_download_asset("definitely-not-there.ckpt")

    # configured assets base URL resolves and caches
    (root / "remote.ckpt").write_text("rw")
    monkeypatch.setenv("YOLO_SOD_ASSETS_URL", base)
    import yolo_sod_tpu.utils.downloads as dl

    monkeypatch.setattr(dl, "ASSET_DIRS", (tmp_path / "cache",))
    out = attempt_download_asset("remote.ckpt")
    assert Path(out).read_text() == "rw"
    # second call hits the cache, no fetch
    assert attempt_download_asset("remote.ckpt") == out
