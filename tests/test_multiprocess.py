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


def test_two_process_fit_parity():
    script = os.path.join(REPO, "scripts", "multiprocess_fit.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children pin their own 1-device count
    # no --port: the parent picks a free one at runtime (collision-safe
    # against concurrent test runs on a shared host)
    out = subprocess.run([sys.executable, script, "--nprocs", "2"],
                         env=env, cwd=REPO, capture_output=True, text=True,
                         timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["ok"] and report["multiprocess"]["process_count"] == 2
