"""True multi-process distribution: N localhost CPU processes under
``jax.distributed.initialize`` run one DP fit step and one slab-sharded
fit step (halo ppermute / hit psum / ray all_gather cross process
boundaries over Gloo) and must match the single-process result
(SURVEY §2.11 item 4; VERDICT r2 missing #5)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(nprocs, retries=1):
    script = os.path.join(REPO, "scripts", "multiprocess_fit.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children pin their own 1-device count
    # no --port: the parent picks a free one at runtime (collision-safe
    # against concurrent test runs on a shared host)
    for attempt in range(retries + 1):
        out = subprocess.run([sys.executable, script,
                              "--nprocs", str(nprocs)],
                             env=env, cwd=REPO, capture_output=True,
                             text=True, timeout=900)
        if out.returncode == 0:
            return json.loads(out.stdout.strip().splitlines()[-1])
        # One retry: when the whole suite shares the 2-core host with the
        # N Gloo children, the coordination service occasionally starves
        # and kills a child (observed only under full-suite contention;
        # standalone runs pass deterministically).  The PARITY assertions
        # themselves are exact — a retry re-checks them, it cannot mask a
        # real mismatch.
        print(f"multiprocess run (nprocs={nprocs}) attempt {attempt} "
              f"failed under contention; stderr tail:\n"
              f"{out.stderr[-500:]}", file=sys.stderr)
    raise AssertionError(out.stderr[-2000:])


def test_two_process_fit_parity():
    report = _run(2)
    assert report["ok"] and report["multiprocess"]["process_count"] == 2


def test_four_process_crossed_mesh_parity():
    """2x2 (data x model) mesh over 4 Gloo processes: the DP gradient psum
    AND the slab halo ppermute / ray all_gather cross process boundaries
    in the SAME fit step, and match the single-process run (VERDICT r3
    next-round item 8)."""
    report = _run(4)
    assert report["ok"] and report["multiprocess"]["process_count"] == 4
    assert "crossed_loss" in report["multiprocess"]
