"""Build hooks: compile the native IO runtime into the wheel.

``native/lidar_io.cpp`` is a plain C-ABI shared library consumed through
ctypes (data/native_io.py), not a CPython extension — so the build step is a
direct compiler invocation (mirroring ``native/Makefile``), with the result
placed inside the package where ``native_io._LIB_PATHS`` finds it.  If no
C++ toolchain is available the wheel still builds; the package falls back to
the numpy implementations at runtime.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        cxx = os.environ.get("CXX", "g++")
        src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "native", "lidar_io.cpp")
        if shutil.which(cxx) is None or not os.path.exists(src):
            print("native toolchain or source unavailable; "
                  "skipping libefficientlo_io.so (numpy fallback applies)",
                  file=sys.stderr)
            return
        out = os.path.join(self.build_lib, "efficientlo_net_tpu",
                           "libefficientlo_io.so")
        cmd = [cxx, "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
               "-pthread", "-o", out, src]
        print(" ".join(cmd), file=sys.stderr)
        subprocess.check_call(cmd)


setup(cmdclass={"build_py": BuildWithNative})
