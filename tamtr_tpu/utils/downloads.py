"""Download / asset utilities (reference `utils/downloads.py:1-397`).

TPU-image note: this image has ZERO network egress, so every function is
built to degrade loudly-but-gracefully — retries exhaust, a clear error
names the URL, and nothing here is imported on any hot path. The offline
test suite exercises the full machinery through `file://` URLs and local
zips; the first networked deployment gets working weight/dataset fetch
(VisDrone protocol: `tools/get_visdrone.py` calls into this).

Covered reference surface:
  is_url            -> is_url              (`downloads.py:30`)
  zip_directory     -> zip_directory       (`downloads.py:70`)
  unzip_file        -> unzip_file          (`downloads.py:109`)
  check_disk_space  -> check_disk_space    (`downloads.py:167`)
  safe_download     -> safe_download       (`downloads.py:240`)
  attempt_download_asset -> attempt_download_asset (`downloads.py:343`)
  download          -> download            (`downloads.py:383`)
"""

from __future__ import annotations

import shutil
import zipfile
from pathlib import Path
from typing import Iterable, Optional, Sequence
from urllib import parse, request

from tamtr_tpu.utils.log import LOGGER

# release asset base for this project's published weights (set when a
# release exists; attempt_download_asset formats `{base}/{name}`)
ASSETS_BASE_URL = "https://github.com/Xjh-UCAS/TAM-TR/releases/download/v0.0.0"
ASSETS_NAMES = ["TAM_TR.pt"]
EXCLUDE_MEMBERS = (".DS_Store", "__MACOSX")


def is_url(url, check: bool = False) -> bool:
    """True if the string parses as a URL; check=True also opens it."""
    try:
        url = str(url)
        result = parse.urlparse(url)
        ok = all([result.scheme, result.netloc or result.scheme == "file"])
        if ok and check:
            with request.urlopen(url) as r:  # noqa: S310 (caller-supplied URL)
                return r.getcode() == 200 if hasattr(r, "getcode") else True
        return ok
    except Exception:
        return False


def zip_directory(directory, compress: bool = True,
                  exclude: Sequence[str] = EXCLUDE_MEMBERS) -> Path:
    """Zip a directory's contents into `<directory>.zip` next to it."""
    directory = Path(directory)
    assert directory.is_dir(), f"not a directory: {directory}"
    files = [
        f for f in directory.rglob("*")
        if f.is_file() and not any(x in f.parts for x in exclude)
    ]
    zip_path = directory.with_suffix(".zip")
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zip_path, "w", comp) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory.parent))
    return zip_path


def unzip_file(file, path=None, exclude: Sequence[str] = EXCLUDE_MEMBERS,
               exist_ok: bool = False) -> Path:
    """Unzip into `path` (default: alongside). Single-top-level archives
    extract in place; flat archives get a directory named after the zip
    (reference behavior). Refuses path-traversal member names."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as zf:
        names = [
            n for n in zf.namelist() if not any(x in n for x in exclude)
        ]
        for n in names:
            if n.startswith("/") or ".." in Path(n).parts:
                raise ValueError(f"unsafe zip member path: {n}")
        tops = {Path(n).parts[0] for n in names if Path(n).parts}
        one_dir = len(tops) == 1 and all("/" in n or n.endswith("/") for n in names)
        if one_dir:  # archive already wraps everything in one directory
            extract_to, target = path, path / next(iter(tops))
        else:  # flat archive: extract under a folder named after the zip
            extract_to = target = path / file.stem
        if target.exists() and any(target.iterdir()) and not exist_ok:
            LOGGER.info(f"skipping unzip: {target} already exists (exist_ok=False)")
            return target
        for n in names:
            zf.extract(n, extract_to)
    return target


def check_disk_space(required_bytes: int, path=Path.cwd(), sf: float = 1.5,
                     hard: bool = True) -> bool:
    """True if `sf * required_bytes` fits on the filesystem of `path`."""
    total, used, free = shutil.disk_usage(path)
    if required_bytes * sf < free:
        return True
    msg = (
        f"insufficient disk space: need {required_bytes * sf / 2**30:.1f} GiB "
        f"(x{sf} safety), have {free / 2**30:.1f} GiB free on {path}"
    )
    if hard:
        raise MemoryError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(
    url: str,
    file=None,
    dir=None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    exist_ok: bool = False,
) -> Path:
    """Retrying fetch with post-checks (reference `safe_download`).

    Supports http(s):// and file:// URLs (the offline tests use file://).
    Downloads to `dir/file` (file defaults to the URL basename), verifies
    the size exceeds `min_bytes`, optionally unzips `.zip` and deletes the
    archive. Raises ConnectionError after `retry` failed attempts.
    """
    name = Path(parse.unquote(str(url))).name.split("?")[0]
    if file is not None and dir is None:
        f = Path(file)
    else:
        f = Path(dir or ".") / (file or name)
    f.parent.mkdir(parents=True, exist_ok=True)
    if not f.exists():
        last_err = None
        for attempt in range(retry):
            try:
                request.urlretrieve(str(url), str(f))  # noqa: S310
                if f.stat().st_size > min_bytes:
                    break
                f.unlink(missing_ok=True)
                last_err = ValueError(f"downloaded file too small (<{min_bytes}B)")
            except Exception as e:
                last_err = e
            LOGGER.warning(f"download attempt {attempt + 1}/{retry} failed for {url}: {last_err}")
        else:
            raise ConnectionError(
                f"failed to download {url} after {retry} attempts "
                f"(note: this image has zero network egress): {last_err}"
            ) from last_err
    if unzip and f.suffix == ".zip":
        out = unzip_file(f, path=f.parent, exist_ok=exist_ok)
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f


def attempt_download_asset(file, base_url: str = ASSETS_BASE_URL) -> str:
    """Resolve a bare known asset name to a local file, downloading from the
    project release if missing (reference `attempt_download_asset`)."""
    file = str(file)
    p = Path(file)
    if p.exists():
        return file
    if p.name in ASSETS_NAMES:
        safe_download(f"{base_url}/{p.name}", file=p, unzip=False)
        return file
    return file


def download(urls: "str | Iterable[str]", dir=Path.cwd(), unzip: bool = True,
             delete: bool = False, threads: int = 1, retry: int = 3) -> None:
    """Concurrent multi-URL download (reference `download`)."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    url_list = [urls] if isinstance(urls, str) else list(urls)
    if threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(
                lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete,
                                        retry=retry),
                url_list,
            ))
    else:
        for u in url_list:
            safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry)
