"""SecLists source (S4/S11, ref /root/reference/src/source/seclists.rs).

Reads a wordlist file under a git-cloned SecLists cache directory
(default ``~/.cache/shaha/seclists``, ref seclists.rs:75-80). The clone
itself is a driver-side subprocess; gated behind availability so the
engine works offline.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import SparkSession

SECLISTS_REPO = "https://github.com/danielmiessler/SecLists.git"


def cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return os.path.join(base, "shaha", "seclists")


def ensure_clone(clone_dir: str | None = None) -> str:
    """Clone or update the SecLists cache (ref seclists.rs:91-116)."""
    target = clone_dir or cache_dir()
    if os.path.isdir(os.path.join(target, ".git")):
        subprocess.run(["git", "-C", target, "pull", "--ff-only", "-q"], check=False)
        return target
    os.makedirs(os.path.dirname(target), exist_ok=True)
    subprocess.run(
        ["git", "clone", "--depth", "1", "-q", SECLISTS_REPO, target], check=True
    )
    return target


def list_wordlists(subpath: str = "", clone_dir: str | None = None) -> list[str]:
    """Recursive sorted ``*.txt`` catalog, skipping dot-dirs
    (S11, ref seclists.rs:122-165)."""
    root = os.path.join(clone_dir or cache_dir(), subpath)
    found: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        for fn in filenames:
            if fn.endswith(".txt"):
                found.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(found)


def seclists_source(spark: SparkSession, subpath: str, clone_dir: str | None = None):
    from shaha_spark.sources.file import file_source

    root = clone_dir if clone_dir is not None else ensure_clone()
    path = os.path.join(root, subpath)
    if not os.path.exists(path):
        raise FileNotFoundError(f"seclists path not found: {subpath}")
    result = file_source(spark, path)
    result.name = f"seclists:{subpath}"
    return result
