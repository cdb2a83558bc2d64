"""External assembler/simulator installation (reference install_tools.py:6-53).

Clones + builds hifiasm 0.18.8, Raven 1.8.1 (print_graphs branch) and PBSIM3
into the configured tool dir.  Network access is required; failures are
reported per tool and do not abort the others.
"""
from __future__ import annotations

import os
import subprocess

from ..config import Config


def _run(cmd: str, cwd: str) -> bool:
    try:
        subprocess.run(cmd, shell=True, cwd=cwd, check=True)
        return True
    except subprocess.CalledProcessError as e:
        print(f"[install-tools] command failed ({e.returncode}): {cmd}")
        return False


def install_tools(cfg: Config | None = None) -> None:
    cfg = cfg or Config()
    save_dir = cfg.paths.tool_dir
    os.makedirs(save_dir, exist_ok=True)

    hifiasm_dir = cfg.paths.hifiasm_dir
    if os.path.isfile(os.path.join(hifiasm_dir, "hifiasm")):
        print("Found hifiasm! Skipping installation...")
    else:
        print("Installing hifiasm...")
        name = os.path.basename(hifiasm_dir)
        if _run("git clone https://github.com/chhylp123/hifiasm.git "
                f"--branch 0.18.8 --single-branch {name}", save_dir):
            _run("make", hifiasm_dir)

    raven_dir = cfg.paths.raven_dir
    if os.path.isfile(os.path.join(raven_dir, "build", "bin", "raven")):
        print("Found raven! Skipping installation...")
    else:
        print("Installing Raven...")
        name = os.path.basename(raven_dir)
        if _run("git clone https://github.com/lbcb-sci/raven.git "
                f"--branch print_graphs --single-branch {name}", save_dir):
            _run("cmake -S ./ -B./build -DRAVEN_BUILD_EXE=1 "
                 "-DCMAKE_BUILD_TYPE=Release", raven_dir)
            _run("cmake --build build", raven_dir)

    pbsim_dir = cfg.paths.pbsim3_dir
    if os.path.isfile(os.path.join(pbsim_dir, "src", "pbsim")):
        print("Found pbsim! Skipping installation...")
    else:
        print("Installing PBSIM3...")
        name = os.path.basename(pbsim_dir)
        if _run(f"git clone https://github.com/yukiteruono/pbsim3.git {name}",
                save_dir):
            _run("./configure; make", pbsim_dir)
