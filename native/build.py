"""Build the native extension in-place: ``python native/build.py``.

Uses g++ directly (no pip): produces nucliadb_tpu_native.*.so at the repo
root, importable when present. Every consumer falls back to the pure-Python
path when the module is absent, so building is optional but recommended for
indexing throughput.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    sources = [
        os.path.join(here, "postings.cpp"),
        os.path.join(here, "hnsw_link.cpp"),
        os.path.join(here, "phrase.cpp"),
        os.path.join(here, "bm25_wand.cpp"),
    ]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(repo, f"nucliadb_tpu_native{suffix}")
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", *sources, "-o", out,
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, os.path.dirname(path))
    import nucliadb_tpu_native  # noqa: F401

    print("import OK:", nucliadb_tpu_native.tokenize_with_positions("Hello, World!"))
