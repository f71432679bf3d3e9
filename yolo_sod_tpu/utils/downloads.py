"""Download / archive helpers (reference utils/downloads.py:37-510).

Stdlib-only re-design (urllib, zipfile, shutil, concurrent.futures) of the
reference's download toolkit: URL checks, zip/unzip with junk-file
exclusions, disk-space guard, retrying `safe_download`, asset resolution
and a threaded multi-URL `download`. Works with `file://` and local-HTTP
URLs, so everything is testable under this deployment's zero-egress policy
(tests/test_downloads.py drives a live in-process HTTP server); remote
GitHub-release resolution is replaced by a configurable assets base URL
(`SETTINGS["assets_url"]` or `YOLO_SOD_ASSETS_URL`) with the local cache
as the first-class source.
"""

from __future__ import annotations

import os
import shutil
import urllib.error
import urllib.parse
import urllib.request
import zipfile
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

from yolo_sod_tpu.utils import LOGGER, TQDM

ASSET_DIRS = (Path.cwd(), Path.cwd() / "weights", Path.home() / ".cache" / "yolo_sod_tpu")
EXCLUDE_JUNK = (".DS_Store", "__MACOSX")


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL; with check=True, also open it
    (reference is_url :37-64)."""
    try:
        url = str(url)
        result = urllib.parse.urlparse(url)
        if not (result.scheme and result.netloc or result.scheme == "file"):
            return False
        if check:
            with urllib.request.urlopen(url) as r:
                return getattr(r, "status", 200) == 200
        return True
    except Exception:
        return False


def delete_dsstore(path, files_to_delete=EXCLUDE_JUNK):
    """Remove macOS junk files under path (reference delete_dsstore :67-90)."""
    for pattern in files_to_delete:
        for f in Path(path).rglob(pattern):
            LOGGER.info(f"deleting {f}")
            shutil.rmtree(f, ignore_errors=True) if f.is_dir() else f.unlink()


def zip_directory(directory, compress: bool = True, exclude=EXCLUDE_JUNK,
                  progress: bool = True) -> Path:
    """Zip the CONTENTS of a directory into <directory>.zip, keeping the
    directory name as the top-level prefix (reference zip_directory :93-129)."""
    delete_dsstore(directory, exclude)
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"Directory '{directory}' does not exist.")
    files = [f for f in directory.rglob("*")
             if f.is_file() and all(x not in f.name for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    compression = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zip_file, "w", compression) as zf:
        for f in TQDM(files, desc=f"Zipping {directory} to {zip_file}",
                      disable=not progress):
            zf.write(f, f.relative_to(directory.parent))
    return zip_file


def unzip_file(file, path=None, exclude=EXCLUDE_JUNK, exist_ok: bool = False,
               progress: bool = True) -> Path:
    """Extract a zip, reproducing the reference's top-level handling
    (unzip_file :132-195): a single-top-level-dir archive extracts into
    `path` directly; a flat archive is wrapped in a `<zipstem>/` directory.
    Skips extraction when the target exists non-empty and not exist_ok.
    """
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        files = [f for f in z.namelist() if all(x not in f for x in exclude)]
        top_level_dirs = {Path(f).parts[0] for f in files}
        if len(top_level_dirs) == 1:
            # One top-level dir: extract it INTO path (reference :170-177).
            extract_path = path / list(top_level_dirs)[0]
        else:
            # Flat archive: wrap in a directory named after the zip.
            path = extract_path = path / file.stem
        if extract_path.exists() and any(extract_path.iterdir()) and not exist_ok:
            LOGGER.warning(f"Skipping {file} unzip as destination {extract_path} "
                           "is not empty.")
            return extract_path
        for f in TQDM(files, desc=f"Unzipping {file} to {path}",
                      disable=not progress):
            if ".." in Path(f).parts:
                LOGGER.warning(f"Potentially insecure file path: {f}, skipping.")
                continue
            z.extract(f, path)
    return extract_path


def url_content_length(url) -> int:
    """Content-Length of a URL (0 when unknown); file:// uses stat."""
    try:
        parsed = urllib.parse.urlparse(str(url))
        if parsed.scheme == "file":
            return Path(urllib.request.url2pathname(parsed.path)).stat().st_size
        req = urllib.request.Request(str(url), method="HEAD")
        with urllib.request.urlopen(req) as r:
            return int(r.headers.get("Content-Length") or 0)
    except Exception:
        return 0


def check_disk_space(url, path=None, sf: float = 1.5, hard: bool = True) -> bool:
    """Require sf x the download size free at path (reference :198-233)."""
    data = url_content_length(url) / (1 << 30)
    total, used, free = (x / (1 << 30) for x in
                         shutil.disk_usage(Path(path or Path.cwd()).anchor or "/"))
    if data * sf < free:
        return True
    text = (f"WARNING: Insufficient free disk space {free:.1f} GB < "
            f"{data * sf:.3f} GB required, Please free "
            f"{data * sf - free:.1f} GB additional disk space and try again.")
    if hard:
        raise MemoryError(text)
    LOGGER.warning(text)
    return False


def _fetch(url, dest: Path):
    """Single-shot 1 MiB-chunk stream copy url -> dest."""
    with urllib.request.urlopen(str(url)) as r, open(dest, "wb") as out:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)


def safe_download(url, file=None, dir=None, unzip: bool = True,
                  delete: bool = False, retry: int = 3, min_bytes: float = 1.0,
                  exist_ok: bool = False, progress: bool = True):
    """Download with retries + min-size validation, then optionally unzip
    (reference safe_download :277-377). Returns the final file or the
    unzip directory when an archive was extracted.
    """
    url = str(url)
    name = Path(urllib.parse.urlparse(url).path).name
    f = Path(dir) / (file or name) if dir else Path(file or name)
    if "://" not in url and Path(url).is_file():       # local path passed as url
        f = Path(url)
    elif not f.is_file():
        LOGGER.info(f"Downloading {url} to '{f}'...")
        f.parent.mkdir(parents=True, exist_ok=True)
        check_disk_space(url, path=f.parent)
        for i in range(retry + 1):
            try:
                _fetch(url, f)
                if f.exists():
                    if f.stat().st_size > min_bytes:
                        break
                    f.unlink()  # too small -> retry
            except Exception as e:
                if i == 0 and not is_url(url):
                    raise ConnectionError(f"Invalid URL: {url}") from e
                if i >= retry:
                    raise ConnectionError(f"Download failure for {url}. "
                                          "Retry limit reached.") from e
                LOGGER.warning(f"Download failure, retrying {i + 1}/{retry} {url}...")
        else:
            raise ConnectionError(f"Download failure for {url}: file below "
                                  f"min_bytes={min_bytes} after {retry} retries.")

    if unzip and f.exists() and f.suffix in ("", ".zip", ".tar", ".gz"):
        if zipfile.is_zipfile(f):
            unzip_dir = unzip_file(f, path=dir or f.parent, exist_ok=exist_ok,
                                   progress=progress)
        elif f.suffix in (".tar", ".gz"):
            unzip_dir = Path(dir or f.parent)
            LOGGER.info(f"Unzipping {f} to {unzip_dir}...")
            shutil.unpack_archive(f, unzip_dir)
        else:
            return f
        if delete:
            f.unlink()
        return unzip_dir
    return f


def assets_base_url() -> str:
    """Base URL assets resolve against — settings/env-provided; empty means
    local-only (the zero-egress default of this deployment)."""
    url = os.environ.get("YOLO_SOD_ASSETS_URL", "")
    if not url:
        try:
            from yolo_sod_tpu.utils import SETTINGS

            url = SETTINGS.get("assets_url", "") or ""
        except Exception:
            url = ""
    return url.rstrip("/")


def attempt_download_asset(file, repo: str = "", release: str = "") -> str:
    """Resolve an asset: local file → local caches → the configured assets
    base URL (reference attempt_download_asset :411-466, with the GitHub
    release API replaced by `assets_url`; strictly local when unset)."""
    p = Path(str(file).strip().replace("'", ""))
    if p.exists():
        return str(p)
    for d in ASSET_DIRS:
        cand = d / p.name
        if cand.exists():
            return str(cand)
    base = assets_base_url()
    if base:
        dest = ASSET_DIRS[-1]
        dest.mkdir(parents=True, exist_ok=True)
        out = safe_download(f"{base}/{p.name}", file=dest / p.name,
                            unzip=False, min_bytes=1)
        return str(out)
    raise FileNotFoundError(
        f"asset '{file}' not found locally and no assets_url is configured "
        f"(network egress is disabled by default); place it under one of "
        f"{[str(d) for d in ASSET_DIRS]} or set YOLO_SOD_ASSETS_URL")


def download(url, dir=None, unzip: bool = True, delete: bool = False,
             threads: int = 1, retry: int = 3, exist_ok: bool = False):
    """Download one or many URLs, optionally concurrently
    (reference download :469-510)."""
    dir = Path(dir or Path.cwd())
    dir.mkdir(parents=True, exist_ok=True)
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(lambda u: safe_download(
                u, dir=dir, unzip=unzip, delete=delete, retry=retry,
                exist_ok=exist_ok, progress=threads <= 1), urls))
    else:
        for u in urls:
            safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry,
                          exist_ok=exist_ok)
