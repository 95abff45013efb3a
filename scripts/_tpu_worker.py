"""Persistent TPU driver loop for interactive development.

The tunneled TPU platform in this environment wedges for minutes when
processes connect/disconnect rapidly, so during development we keep ONE
process alive and feed it work: it polls /tmp/tpu_jobs/ for numbered
job files (NNN.py), executes each in a shared namespace (so compiled
programs and device state persist across jobs), and writes
NNN.out (stdout+stderr+traceback) followed by NNN.done.

Not part of the framework — a development harness only.

Usage:  python scripts/_tpu_worker.py   # runs until killed or EXIT job
Submit: write /tmp/tpu_jobs/001.py; wait for /tmp/tpu_jobs/001.done
A job file containing only "EXIT" stops the worker.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"


def main() -> None:
    os.makedirs(JOBS, exist_ok=True)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("worker: devices", jax.devices(), flush=True)
    print("worker: warmup", float(jnp.sum(jnp.ones((8, 128)))), flush=True)
    ns: dict = {"jax": jax, "jnp": jnp}
    done: set[str] = set()
    print("worker: ready", flush=True)
    while True:
        jobs = sorted(
            f for f in os.listdir(JOBS)
            if f.endswith(".py") and f not in done
            and not os.path.exists(os.path.join(JOBS, f[:-3] + ".done"))
        )
        for f in jobs:
            path = os.path.join(JOBS, f)
            # Skip files modified <1s ago: a submitter writing a large
            # job file non-atomically must not race the poll loop.
            if time.time() - os.path.getmtime(path) < 1.0:
                continue
            src = open(path).read()
            done.add(f)
            if src.strip() == "EXIT":
                print("worker: exit", flush=True)
                open(os.path.join(JOBS, f[:-3] + ".done"), "w").write("exit")
                return
            buf = io.StringIO()
            t0 = time.perf_counter()
            try:
                with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                    exec(compile(src, path, "exec"), ns)
                status = "ok"
            except Exception:
                buf.write(traceback.format_exc())
                status = "error"
            dt = time.perf_counter() - t0
            out = os.path.join(JOBS, f[:-3] + ".out")
            open(out, "w").write(buf.getvalue())
            open(os.path.join(JOBS, f[:-3] + ".done"), "w").write(
                f"{status} {dt:.1f}s"
            )
            print(f"worker: {f} -> {status} in {dt:.1f}s", flush=True)
        time.sleep(0.5)


if __name__ == "__main__":
    main()
