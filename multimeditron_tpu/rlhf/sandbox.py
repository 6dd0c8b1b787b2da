"""Sandboxed code execution for RL rewards.

Capability parity with the reference's ``NsJailExecutor``
(``tools/__init__.py:10-110``) and its ``PyExecService`` Ray Serve stub
(``cli/debug.py:9-44``): run untrusted Python produced during RLHF under a
native jail. The jail is a first-party C++ binary (``native/sandbox``)
compiled on demand with g++ — fork + setsid + rlimits + wall-clock
watchdog (process-group SIGKILL), optional namespace unshare.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import subprocess
import sys
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "sandbox",
)


@dataclasses.dataclass
class ExecResult:
    stdout: str
    stderr: str
    returncode: int
    timed_out: bool


class SandboxExecutor:
    def __init__(
        self,
        timeout_sec: int = 10,
        cpu_sec: int = 10,
        mem_mb: int = 512,
        python_interpreter: Optional[str] = None,
        workdir: Optional[str] = None,
        unshare: bool = False,
    ):
        self.timeout_sec = timeout_sec
        self.cpu_sec = cpu_sec
        self.mem_mb = mem_mb
        self.python_interpreter = python_interpreter or sys.executable
        self.workdir = workdir
        self.unshare = unshare
        self.binary = self._ensure_built()

    @staticmethod
    def _ensure_built() -> str:
        binary = os.path.join(_NATIVE_DIR, "mmt_sandbox")
        src = os.path.join(_NATIVE_DIR, "sandbox.cc")
        if os.path.exists(binary) and os.path.getmtime(binary) >= os.path.getmtime(src):
            return binary
        cxx = shutil.which("g++") or shutil.which("c++")
        if cxx is None:
            raise RuntimeError("No C++ compiler available to build mmt_sandbox")
        subprocess.run(
            [cxx, "-O2", "-std=c++17", "-Wall", "-o", binary, src],
            check=True,
            cwd=_NATIVE_DIR,
        )
        return binary

    def run_code(self, code: str) -> ExecResult:
        """Execute Python ``code`` under the jail; payload goes via stdin."""
        return self.run_command([self.python_interpreter, "-I", "-"], stdin=code)

    def run_command(self, cmd, stdin: str = "") -> ExecResult:
        argv = [
            self.binary,
            "--timeout", str(self.timeout_sec),
            "--cpu", str(self.cpu_sec),
            "--mem", str(self.mem_mb),
        ]
        if self.workdir:
            argv += ["--chdir", self.workdir]
        if self.unshare:
            argv += ["--unshare"]
        argv += ["--", *cmd]
        proc = subprocess.run(
            argv,
            input=stdin.encode(),
            capture_output=True,
            timeout=self.timeout_sec + 10,  # belt over the jail's own watchdog
        )
        return ExecResult(
            stdout=proc.stdout.decode(errors="replace"),
            stderr=proc.stderr.decode(errors="replace"),
            returncode=proc.returncode,
            timed_out=proc.returncode == 124,
        )
