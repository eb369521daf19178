#!/usr/bin/env python
"""Summarize the round-5 TPU queue results under .runs_r5/q/.

Pulls the one-line machine-readable results out of each job log so the
round-close PARITY.md update is a copy-paste, not an archaeology dig:
  * fwdcopy_sweep.log -> per-size candidate table (tools/bench_fwd_copies.py)
  * quad_{off,on}_base.log, packmax_base.log, photo_base.log
                      -> per-config JSON lines (tools/bench_nerfacto.py)
  * bench_r5.log      -> the bench.py JSON line

The two r4 takeover jobs (base_flagship_L, hugs_rehearsal_L) live in
.runs_r4/q/ — harvest those with tools/harvest_r4.py.

Usage: python tools/harvest_r5.py [--q_dir .runs_r5/q]
Exit status 1 if any expected job has neither a .done marker nor a log.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

EXPECTED = [
    "fwdcopy_sweep", "quad_off_base", "quad_on_base", "packmax_base",
    "photo_base", "bench_r5",
    # part B (tools/tpu_queue_r5b.sh): additive-hash perf + quality A/B
    "addhash_bench", "addhash_quality_tpu", "addhash_quality_base",
    # part C (tools/tpu_queue_r5c.sh): corner-packed backward A/B
    "packbwd_addhash", "packbwd_xor_base",
    # part D (tools/tpu_queue_r5d.sh): HuGS rehearsal with compact decode
    "hugs_rehearsal_r5",
    # part E (tools/tpu_queue_r5e.sh): phototourism/distractor addhash bench
    "addhash_twins_bench",
    # part F (tools/tpu_queue_r5f.sh): re-bank under the flipped packbwd
    # default + the part-B/E retries + the committed bench preview
    "packbwd_xor_rebench", "addhash_twins_rebench",
    "addhash_quality_tpu_retry", "bench_final",
    # part G (tools/tpu_queue_r5g.sh): HuGS AMG dispatch/transfer sweep
    "hugs_ppb64_mm64", "hugs_ppb256_mm0", "hugs_ppb256_mm64",
    # part H (tools/tpu_queue_r5h.sh): AMG sweep tail (ppb512 is an
    # EXPECTED fail — on-device bit-pack OOMs at that batch, PARITY.md)
    "hugs_ppb512_mm64", "hugs_ppb256_mm32",
    # part I (tools/tpu_queue_r5i.sh): bf16-overlay quality A/B +
    # strong-reg nerfw flagship probe
    "bf16_flagship_fp32ctl", "bf16_flagship_bf16", "nerfw_strongreg",
    # part J (tools/tpu_queue_r5j.sh): quality capstones. xor_tuned_ctl hung
    # client-side at 2700/3000 and was killed; part K
    # (tools/tpu_queue_r5k.sh) resumes it from its checkpoints.
    "xor_tuned_ctl", "addhash_wallclock", "bf16_flagship_10k",
    "xor_tuned_ctl_retry",
]


def _lines(path):
    if not os.path.exists(path):
        return []
    with open(path, errors="replace") as f:
        return f.read().splitlines()


def _json_lines(lines):
    out = []
    for line in lines:
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--q_dir", default=".runs_r5/q")
    args = parser.parse_args(argv)
    q = args.q_dir

    missing = []
    for name in EXPECTED:
        log = os.path.join(q, f"{name}.log")
        done = os.path.exists(os.path.join(q, f"{name}.done"))
        lines = _lines(log)
        status = "done" if done else ("running/failed" if lines else "absent")
        print(f"== {name} [{status}]")
        if not lines and not done:
            missing.append(name)
            continue
        if name == "fwdcopy_sweep":
            for line in lines:
                if re.search(r"M desc/s|--- C=|FAILED", line):
                    print("  " + line)
        elif name.startswith("addhash_quality") or name in (
                "bf16_flagship_fp32ctl", "bf16_flagship_bf16",
                "nerfw_strongreg", "xor_tuned_ctl", "addhash_wallclock",
                "bf16_flagship_10k", "xor_tuned_ctl_retry"):
            train = [l for l in lines if re.search(r"steps/s.*rays/s$", l)]
            if train:
                print("  " + train[-1].strip())
            for line in lines:
                if re.search(r"RESULT|LOCALIZATION|wall-clock", line):
                    print("  " + line.strip())
        else:  # JSON-emitting benches
            for obj in _json_lines(lines):
                print("  " + json.dumps(obj))
    sys.exit(1 if missing else 0)


if __name__ == "__main__":
    main()
