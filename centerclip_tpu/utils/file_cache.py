# coding=utf-8
"""URL/S3 file cache and archive resolution.

TPU-native counterpart of the reference's AllenNLP-style machinery
(reference: modules/file.py:29-238 — `cached_path`/`get_from_cache` with
hashed filenames + ETag metadata sidecars; modules/base.py:34-91 —
`PretrainedConfig.get_config`'s dir-or-tar.gz archive resolution).  The
semantics match so cache directories populated by the reference resolve
identically here, but the implementation is stdlib-only: `urllib` for HTTP
(requests is not guaranteed in this image) and `boto3` gated behind an
import for s3:// URLs, mirroring how the reference gates PyAV/LMDB.

Downloads are atomic: a temp file in the cache dir is `os.replace`d into
place, so an interrupted fetch never yields a truncated cache entry
(reference achieves this with NamedTemporaryFile + copy, file.py:194-218).
"""
from __future__ import annotations

import json
import os
import shutil
import tarfile
import tempfile
import urllib.request
from hashlib import sha256
from pathlib import Path
from typing import Optional, Set, Tuple, Union
from urllib.parse import urlparse

PathLike = Union[str, Path]

CACHE_DIR = os.environ.get(
    "CENTERCLIP_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "centerclip_tpu"))


def url_to_filename(url: str, etag: Optional[str] = None) -> str:
    """Repeatable hashed cache filename; ETag hash appended after a period
    so a changed remote object becomes a new entry (file.py:29-44)."""
    name = sha256(url.encode("utf-8")).hexdigest()
    if etag:
        name += "." + sha256(etag.encode("utf-8")).hexdigest()
    return name


def filename_to_url(filename: str,
                    cache_dir: Optional[PathLike] = None) -> Tuple[str, Optional[str]]:
    """Recover (url, etag) from a cache entry's `.json` sidecar
    (file.py:47-70)."""
    cache_dir = str(cache_dir or CACHE_DIR)
    cache_path = os.path.join(cache_dir, filename)
    if not os.path.exists(cache_path):
        raise FileNotFoundError(f"file {cache_path} not found")
    meta_path = cache_path + ".json"
    if not os.path.exists(meta_path):
        raise FileNotFoundError(f"file {meta_path} not found")
    with open(meta_path) as f:
        meta = json.load(f)
    return meta["url"], meta["etag"]


def cached_path(url_or_filename: PathLike,
                cache_dir: Optional[PathLike] = None) -> str:
    """Resolve a URL (download + cache) or a local path (existence-checked)
    to a readable local path (file.py:73-100)."""
    url_or_filename = str(url_or_filename)
    cache_dir = str(cache_dir or CACHE_DIR)
    scheme = urlparse(url_or_filename).scheme
    if scheme in ("http", "https", "s3"):
        return get_from_cache(url_or_filename, cache_dir)
    if os.path.exists(url_or_filename):
        return url_or_filename
    if scheme == "":
        raise FileNotFoundError(f"file {url_or_filename} not found")
    raise ValueError(
        f"unable to parse {url_or_filename} as a URL or as a local path")


# --------------------------------------------------------------------- s3
def split_s3_path(url: str) -> Tuple[str, str]:
    """s3://bucket/key -> (bucket, key) (file.py:103-113)."""
    parsed = urlparse(url)
    if not parsed.netloc or not parsed.path:
        raise ValueError(f"bad s3 path {url}")
    return parsed.netloc, parsed.path.lstrip("/")


def _s3_resource():
    try:
        import boto3  # gated: not in this image; reference hard-imports it
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "s3:// paths need boto3 (`pip install boto3`)") from e
    return boto3.resource("s3")


def s3_etag(url: str) -> Optional[str]:
    bucket, key = split_s3_path(url)
    obj = _s3_resource().Object(bucket, key)
    return obj.e_tag


def s3_get(url: str, temp_file) -> None:
    bucket, key = split_s3_path(url)
    _s3_resource().Bucket(bucket).download_fileobj(key, temp_file)


# ------------------------------------------------------------------- http
def http_etag(url: str) -> Optional[str]:
    """HEAD request for the ETag; non-200 raises like the reference
    (file.py:180-185)."""
    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req) as resp:
        if resp.status != 200:
            raise IOError(f"HEAD request failed for url {url} "
                          f"with status code {resp.status}")
        return resp.headers.get("ETag")


def http_get(url: str, temp_file) -> None:
    with urllib.request.urlopen(url) as src:
        shutil.copyfileobj(src, temp_file, length=1 << 20)


def get_from_cache(url: str, cache_dir: Optional[PathLike] = None) -> str:
    """Download-once semantics keyed on (url, etag) (file.py:164-220)."""
    cache_dir = str(cache_dir or CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    etag = s3_etag(url) if url.startswith("s3://") else http_etag(url)
    cache_path = os.path.join(cache_dir, url_to_filename(url, etag))
    if not os.path.exists(cache_path):
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".download")
        try:
            with os.fdopen(fd, "wb") as temp_file:
                if url.startswith("s3://"):
                    s3_get(url, temp_file)
                else:
                    http_get(url, temp_file)
            # sidecar BEFORE publishing the payload: the reverse order can
            # be interrupted between the two, leaving a permanent entry
            # whose filename_to_url raises forever
            with open(cache_path + ".json", "w") as meta_file:
                json.dump({"url": url, "etag": etag}, meta_file)
            os.replace(tmp, cache_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    elif not os.path.exists(cache_path + ".json"):
        # heal an entry published without its sidecar (older versions wrote
        # the payload first and could be interrupted in between)
        with open(cache_path + ".json", "w") as meta_file:
            json.dump({"url": url, "etag": etag}, meta_file)
    return cache_path


# --------------------------------------------------------------- archives
def resolve_archive_dir(name_or_path: PathLike,
                        cache_dir: Optional[PathLike] = None) -> Tuple[str, Optional[str]]:
    """Resolve a pretrained-archive reference to a serialization directory.

    Accepts a directory, a `.tar.gz` archive path, or a URL to one —
    the surface `PretrainedConfig.get_config` drives (base.py:34-70).
    Returns (serialization_dir, tempdir); the caller owns removing
    `tempdir` (non-None only when an archive was extracted).
    """
    resolved = cached_path(name_or_path, cache_dir=cache_dir)
    if os.path.isdir(resolved):
        return resolved, None
    tempdir = tempfile.mkdtemp()
    with tarfile.open(resolved, "r:gz") as archive:
        archive.extractall(tempdir, filter="data")
    return tempdir, tempdir


# ------------------------------------------------------------------ misc
def read_set_from_file(filename: PathLike) -> Set[str]:
    """One-item-per-line file -> set (file.py:223-232)."""
    with open(filename, encoding="utf-8") as f:
        return {line.rstrip() for line in f}


def get_file_extension(path: str, dot: bool = True, lower: bool = True) -> str:
    ext = os.path.splitext(path)[1]
    ext = ext if dot else ext[1:]
    return ext.lower() if lower else ext
