"""Filesystem + misc utilities — ``hl.hadoop_*`` / ``hl.utils`` parity.

Parity target: hail/python/hail/utils/hadoop_utils.py. The reference
routes these through its backend's Hadoop filesystem abstraction; here
they route through ``fsspec`` when the path has a scheme fsspec knows
(s3://, gs://, hdfs:// — present on real clusters alongside pyspark)
and fall back to the local filesystem for bare paths, which is also
what a ``local[N]`` session resolves them to. Text mode, globbing and
the stat dict shape follow the reference's documented behavior.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import shutil
import tempfile
from typing import Any


def _fs(path: str):
    """(filesystem, path) — fsspec for scheme'd paths, None for local."""
    if "://" in path:
        try:
            import fsspec

            fs, p = fsspec.core.url_to_fs(path)
            return fs, p
        except ImportError as exc:
            raise RuntimeError(
                f"path '{path}' has a URL scheme but fsspec is not installed"
            ) from exc
    return None, path


def hadoop_open(path: str, mode: str = "r", buffer_size: int = 8192):
    """Open a file (ref hadoop_utils.py:12 ``hl.hadoop_open``).
    Supports r/w/x and binary variants; gzipped paths are transparently
    (de)compressed like the reference."""
    fs, p = _fs(path)
    raw_mode = mode if "b" in mode else mode + "b"
    raw = fs.open(p, raw_mode) if fs else open(p, raw_mode, buffering=buffer_size)
    if p.endswith(".gz") or p.endswith(".bgz"):
        import gzip

        raw = gzip.open(raw, raw_mode)
    if "b" in mode:
        return raw
    return io.TextIOWrapper(raw)


def hadoop_exists(path: str) -> bool:
    fs, p = _fs(path)
    return fs.exists(p) if fs else os.path.exists(p)


def hadoop_is_file(path: str) -> bool:
    fs, p = _fs(path)
    return fs.isfile(p) if fs else os.path.isfile(p)


def hadoop_is_dir(path: str) -> bool:
    fs, p = _fs(path)
    return fs.isdir(p) if fs else os.path.isdir(p)


def hadoop_stat(path: str) -> dict[str, Any]:
    """Stat dict in the reference's shape (ref hadoop_utils.py:211):
    path / size_bytes / size / is_dir / modification_time / owner."""
    fs, p = _fs(path)
    if fs:
        info = fs.info(p)
        size = int(info.get("size") or 0)
        is_dir = info.get("type") == "directory"
        mtime = info.get("mtime")
    else:
        st = os.stat(p)
        size = st.st_size
        is_dir = os.path.isdir(p)
        mtime = st.st_mtime
    return {
        "path": path,
        "size_bytes": size,
        "size": _human(size),
        "is_dir": is_dir,
        "modification_time": mtime,
        "owner": "",
    }


def hadoop_ls(path: str) -> list[dict[str, Any]]:
    """List a directory or glob (ref hadoop_utils.py:241)."""
    fs, p = _fs(path)
    if fs:
        entries = fs.ls(p, detail=False)
        return [hadoop_stat(e if "://" in e else path.split("://")[0] + "://" + e) for e in entries]
    if os.path.isdir(p):
        entries = sorted(os.path.join(p, e) for e in os.listdir(p))
    else:
        entries = sorted(_glob.glob(p))
    return [hadoop_stat(e) for e in entries]


def hadoop_copy(src: str, dest: str) -> None:
    """Copy one file (ref hadoop_utils.py:275). Scheme'd paths stream
    through open handles; local paths use shutil."""
    sfs, sp = _fs(src)
    dfs, dp = _fs(dest)
    if sfs is None and dfs is None:
        shutil.copyfile(sp, dp)
        return
    with hadoop_open(src, "rb") as fin, hadoop_open(dest, "wb") as fout:
        shutil.copyfileobj(fin, fout)


def hadoop_scheme_supported(scheme: str) -> bool:
    """Whether a URL scheme is readable here (ref hadoop_utils.py:305)."""
    if scheme in ("", "file"):
        return True
    try:
        import fsspec

        return scheme in fsspec.available_protocols()
    except ImportError:
        return False


def _human(n: int) -> str:
    for unit in ("B", "K", "M", "G", "T", "P"):
        if n < 1024:
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n:.1f}E"


class TemporaryFilename:
    """Context manager yielding a fresh temp file path, removed on exit
    (ref utils/__init__.py TemporaryFilename)."""

    def __init__(self, prefix: str = "", suffix: str = "", dir: str | None = None):
        fd, self.name = tempfile.mkstemp(prefix=prefix, suffix=suffix, dir=dir)
        os.close(fd)
        os.unlink(self.name)

    def __enter__(self) -> str:
        return self.name

    def __exit__(self, *exc) -> None:
        if os.path.exists(self.name):
            if os.path.isdir(self.name):
                shutil.rmtree(self.name, ignore_errors=True)
            else:
                os.unlink(self.name)


class TemporaryDirectory:
    """Context manager yielding a fresh temp dir path, removed on exit
    (ref utils/__init__.py TemporaryDirectory)."""

    def __init__(self, prefix: str = "", suffix: str = "", dir: str | None = None):
        self.name = tempfile.mkdtemp(prefix=prefix, suffix=suffix, dir=dir)

    def __enter__(self) -> str:
        return self.name

    def __exit__(self, *exc) -> None:
        shutil.rmtree(self.name, ignore_errors=True)


# ------------------------------------------------------------------ #
# value types (ref hail/utils/struct.py, hail/utils/interval.py)
# ------------------------------------------------------------------ #
class Struct(dict):
    """Nested annotation structure (ref utils/struct.py:10): a mapping
    whose fields read as attributes — ``Struct(foo=5).foo == 5``.
    Spark rows convert losslessly: ``Struct(**row.asDict())``."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    def __repr__(self):
        return "Struct(" + ", ".join(f"{k}={v!r}" for k, v in self.items()) + ")"

    def annotate(self, **kwargs) -> "Struct":
        out = Struct(self)
        out.update(kwargs)
        return out

    def select(self, *fields, **kwargs) -> "Struct":
        out = Struct({k: self[k] for k in fields})
        out.update(kwargs)
        return out

    def drop(self, *fields) -> "Struct":
        return Struct({k: v for k, v in self.items() if k not in fields})


class Interval:
    """Half-open-by-default interval value (ref utils/interval.py):
    start/end with inclusivity flags; ``contains`` mirrors the engine's
    interval-join predicate (expr/genome.py)."""

    def __init__(self, start, end, includes_start: bool = True, includes_end: bool = False):
        self.start = start
        self.end = end
        self.includes_start = includes_start
        self.includes_end = includes_end

    def contains(self, value) -> bool:
        lo = value >= self.start if self.includes_start else value > self.start
        hi = value <= self.end if self.includes_end else value < self.end
        return lo and hi

    def overlaps(self, other: "Interval") -> bool:
        return self.contains(other.start) or other.contains(self.start)

    def __eq__(self, other):
        return isinstance(other, Interval) and (
            self.start, self.end, self.includes_start, self.includes_end
        ) == (other.start, other.end, other.includes_start, other.includes_end)

    def __hash__(self):
        return hash((self.start, self.end, self.includes_start, self.includes_end))

    def __repr__(self):
        lb = "[" if self.includes_start else "("
        rb = "]" if self.includes_end else ")"
        return f"Interval{lb}{self.start!r}, {self.end!r}{rb}"


# Batch-region sentinel (ref utils/misc.py:674) — meaningless for a
# Spark deployment but part of the public surface.
ANY_REGION = ["any_region"]
