#!/usr/bin/env python
"""Local multi-process launcher for the OBJCAVIT_* distributed entry path.

Spawns N copies of a command (default: ``python main.py ...``) with the
coordinator env wired up — the single-machine analogue of a multi-host
launch (one process per host on a real pod; see docs/MIGRATION.md "DDP
recipe mapping"). Mirrors the reference's Lightning per-GPU process spawn
(/root/reference/main.py:129-131) at the process-management level only;
the in-process work is jax.distributed + the global mesh.

    python scripts/launch_multiprocess.py -n 2 -- python main.py -c cfg.yaml

Options:
  -n/--num-processes   process count (default 2)
  --port               coordinator port (default: an OS-assigned free port)
  --cpu-devices        set a virtual CPU device count per process (testing
                       without TPUs; adds XLA_FLAGS + JAX_PLATFORMS=cpu and
                       the gloo collectives config via OBJCAVIT_CPU_GLOO=1,
                       which main.py-style entry points ignore harmlessly)

Each child's stdout/stderr is prefixed with its rank. Exit status is the
first non-zero child status (remaining children are terminated).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _pump(rank: int, stream, out):
    for line in iter(stream.readline, ""):
        out.write(f"[rank {rank}] {line}")
        out.flush()


def main() -> int:
    ap = argparse.ArgumentParser(
        usage="%(prog)s [-n N] [--port P] [--cpu-devices D] -- command ..."
    )
    ap.add_argument("-n", "--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--cpu-devices", type=int, default=None)
    ap.add_argument("command", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (put it after --)")

    port = args.port or _free_port()
    procs: list[subprocess.Popen] = []
    pumps = []
    for rank in range(args.num_processes):
        env = dict(os.environ)
        env["OBJCAVIT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["OBJCAVIT_NUM_PROCESSES"] = str(args.num_processes)
        env["OBJCAVIT_PROCESS_ID"] = str(rank)
        if args.cpu_devices:
            env["JAX_PLATFORMS"] = "cpu"
            flags = [
                f
                for f in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in f
            ]
            flags.append(
                f"--xla_force_host_platform_device_count={args.cpu_devices}"
            )
            env["XLA_FLAGS"] = " ".join(flags)
            env["OBJCAVIT_CPU_GLOO"] = "1"
        p = subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, bufsize=1,
        )
        procs.append(p)
        t = threading.Thread(
            target=_pump, args=(rank, p.stdout, sys.stdout), daemon=True
        )
        t.start()
        pumps.append(t)

    rc = 0
    try:
        for p in procs:
            code = p.wait()
            if code != 0 and rc == 0:
                rc = code
                for q in procs:  # a dead rank wedges the others' collectives
                    if q.poll() is None:
                        q.terminate()
    except KeyboardInterrupt:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGINT)
        rc = 130
    for t in pumps:
        t.join(timeout=5)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
