"""Dataset download with artifacts-mirror fallback.

TPU-native rebuild of the reference's `src/download_with_fallback.jl`
(39 LoC; SURVEY.md §2a "Download fallback" row): try the dataset's primary
URL; on any failure fetch the same file from the artifacts mirror
(`ARTIFACTS_BASE_URL/<filename>`); either way land it at the metadatum's
cache path via an atomic temp-file + rename so concurrent readers and
crashed downloads never leave a truncated file behind (reference
`:6-15,30-39`).

Zero-egress environments: both fetch attempts raise, and callers fall back
to local files / analytic proxies (see `metadata.load_native`). The
plumbing is exercised in tests with ``file://`` URLs, which take the same
code path through urllib.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request

# reference `download_with_fallback.jl:4` — the NumericalEarthArtifacts
# GitHub release mirror (NumericalEarth org, `data-v1` release tag).
# Overridable for private mirrors / testing (file:// URLs work too).
ARTIFACTS_BASE_URL = os.environ.get(
    "CLIMAOCEAN_ARTIFACTS_URL",
    "https://github.com/NumericalEarth/NumericalEarthArtifacts/"
    "releases/download/data-v1")


def _fetch(url, dst_path, timeout=60):
    """Stream ``url`` into ``dst_path`` atomically: download to a temp file
    in the destination directory, then rename(2) into place."""
    d = os.path.dirname(os.path.abspath(dst_path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(prefix=".download_", dir=d)
    try:
        with os.fdopen(fd, "wb") as out, \
                urllib.request.urlopen(url, timeout=timeout) as resp:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        os.replace(tmp, dst_path)
        return dst_path
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def download_from_artifacts(filename, dst_path,
                            base_url=ARTIFACTS_BASE_URL, timeout=60):
    """Fetch ``filename`` from the artifacts mirror (reference
    `download_from_artifacts`, `download_with_fallback.jl:30-39`)."""
    return _fetch(f"{base_url}/{filename}", dst_path, timeout=timeout)


def download_with_fallback(url, dst_path, filename=None,
                           base_url=ARTIFACTS_BASE_URL, timeout=60):
    """Download ``url`` to ``dst_path``; on ANY failure retry from the
    artifacts mirror under the same ``filename`` (default: the
    destination's basename) — reference `download_with_fallback`
    (`download_with_fallback.jl:6-15`). Returns ``dst_path``; an existing
    file is kept (the cache hit path of `metadata_path`)."""
    if os.path.exists(dst_path):
        return dst_path
    try:
        return _fetch(url, dst_path, timeout=timeout)
    except Exception:
        return download_from_artifacts(filename or os.path.basename(dst_path),
                                       dst_path, base_url=base_url,
                                       timeout=timeout)


def download_metadatum(meta, url=None, base_url=ARTIFACTS_BASE_URL):
    """Resolve a `Metadatum` to its cache path, downloading when missing —
    the reference's `Downloads.download(metadata)` entry point (call
    stack SURVEY.md §3.3). The primary URL comes from the dataset's
    catalog entry (`data.catalog` — per-dataset filename/URL conventions,
    env-overridable) unless ``url`` overrides it; the artifacts mirror is
    the fallback either way. Failures propagate so `load_native` can fall
    back to local/synthetic data."""
    from .catalog import catalog_entry

    entry = catalog_entry(meta.dataset.name) if meta.dataset else None
    if entry is not None:
        try:
            fname = entry.filename(meta.name, meta.date)
        except KeyError:
            fname = None
        if fname is not None:
            dst = os.path.join(meta.dir, os.path.basename(fname))
            if os.path.exists(dst):
                return dst
            primary = url or entry.url(meta.name, meta.date)
            return download_with_fallback(primary, dst,
                                          filename=os.path.basename(fname),
                                          base_url=base_url)
    dst = meta.path()
    if os.path.exists(dst):
        return dst
    name = os.path.basename(dst)
    if url is not None:
        return download_with_fallback(url, dst, filename=name,
                                      base_url=base_url)
    return download_from_artifacts(name, dst, base_url=base_url)
