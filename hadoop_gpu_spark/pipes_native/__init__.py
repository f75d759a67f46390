"""Compiled native UDFs for the Pipes binary-protocol surface.

The reference's Pipes runtime executes user C++ binaries against its VInt
byte protocol (M/pipes/BinaryProtocol.java:62-80; example corpus
H/src/examples/pipes/impl/). This package carries the engine's native
task sources (original implementations of that contract — see each .cc
header) and a build helper that compiles them on demand with the host
toolchain.

Distribution model at scale: the reference ships the compiled binary to
workers via DistributedCache (M/pipes/Submitter.java); on a real cluster
the equivalent is ``spark.sparkContext.addFile(binary)`` /
``--files`` + referencing it by SparkFiles path inside the partition
function. On local[*] every executor thread shares the driver
filesystem, so the compiled path is used directly.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

_SRC_DIR = os.path.dirname(__file__)


def native_source(name: str) -> str:
    """Path of the bundled C++ source for ``name`` (e.g. 'wordcount')."""
    path = os.path.join(_SRC_DIR, f"{name}.cc")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return path


def compiler() -> str | None:
    """The available C++ compiler, or None (callers must skip/raise)."""
    for cc in ("g++", "c++", "clang++"):
        found = shutil.which(cc)
        if found:
            return found
    return None


def ensure_built(name: str = "wordcount") -> str:
    """Compile ``name``.cc (if not cached) and return the binary path.

    The cache key includes a hash of the source, so editing the .cc file
    invalidates the old binary. The build is atomic (compile to a temp
    name, rename into place) so concurrent callers race benignly.
    Raises RuntimeError when no C++ toolchain is available — callers that
    can degrade should check :func:`compiler` first.
    """
    cc = compiler()
    if cc is None:
        raise RuntimeError("no C++ compiler on PATH; Pipes native leg unavailable")
    src = native_source(name)
    h = hashlib.md5()
    with open(src, "rb") as f:
        h.update(f.read())
    # local headers are part of the build input: a transport-header edit
    # must invalidate cached binaries too
    for extra in sorted(os.listdir(_SRC_DIR)):
        if extra.endswith(".h"):
            with open(os.path.join(_SRC_DIR, extra), "rb") as f:
                h.update(f.read())
    tag = h.hexdigest()[:12]
    cache_dir = os.path.join(tempfile.gettempdir(), "hgs_native")
    os.makedirs(cache_dir, exist_ok=True)
    binary = os.path.join(cache_dir, f"{name}-{tag}")
    if os.path.exists(binary):
        return binary
    tmp = f"{binary}.build{os.getpid()}"
    subprocess.run([cc, "-O2", "-o", tmp, src], check=True, capture_output=True)
    os.replace(tmp, binary)
    return binary
