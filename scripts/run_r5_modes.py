"""Round-5 refresh runs in ONE process (relay session init is paid once):

1. CLAP scaling row: reference 2048, candidate 8192 device-resident clips
   (VERDICT r4 #8 — confirms the blocked N^2 metric tails hold E2E at 4x
   the set size; 8192+8192 f32 would exceed v5e HBM).
2. VGGish refresh on the round-5 kernel set (VERDICT r4 #7).
3. APA refresh (VERDICT r4 #7).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_r5_modes.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def banner(s):
    print(f"\n===== {s} =====", flush=True)
    print(f"\n===== {s} =====", file=sys.stderr, flush=True)


banner("VGGish refresh (8192 clips)")
bench.N_CLIPS = 8192
bench.main_vggish()

banner("APA refresh (1024 pairs)")
bench.main_apa()

banner("CLAP scaling: ref 2048 / cand 8192, loop batch 512")
# batch 512: the batch-2048 forward's intermediates on top of the ~10 GB
# of resident waveforms OOM'd v5e HBM (first attempt, 2026-08-21)
os.environ["BENCH_CLIPS_REF"] = "2048"
bench.BATCH_SIZE = 512
bench.main()
