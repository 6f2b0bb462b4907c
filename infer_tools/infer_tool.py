"""Reference-compatible import surface (infer_tools/infer_tool.py)."""

from diffsvc_tpu.infer.svc import (F0_CACHE_PATH, Svc, get_md5, read_temp,
                                   write_temp)
from diffsvc_tpu.utils.audio_io import format_wav
from diffsvc_tpu.utils.misc import timeit


def fill_a_to_b(a, b):
    if len(a) < len(b):
        a.extend([a[0]] * (len(b) - len(a)))


def mkdir(paths):
    import os

    for p in paths:
        os.makedirs(p, exist_ok=True)


def get_end_file(dir_path, end):
    import os

    file_lists = []
    for root, dirs, files in os.walk(dir_path):
        files = [f for f in files if f[0] != "."]
        dirs[:] = [d for d in dirs if d[0] != "."]
        for f_file in files:
            if f_file.endswith(end):
                file_lists.append(os.path.join(root, f_file).replace("\\", "/"))
    return file_lists


__all__ = ["Svc", "read_temp", "write_temp", "get_md5", "format_wav",
           "timeit", "fill_a_to_b", "mkdir", "get_end_file", "F0_CACHE_PATH"]
