"""Build the native host runtime: ``python -m diffsvc_tpu.native.build``."""

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "src", "dsvc_native.cpp")
    out = os.path.join(here, "dsvc_native.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", out]
    if verbose:
        print("|", " ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print(f"| built {path}")
    sys.exit(0)
