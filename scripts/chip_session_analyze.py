#!/usr/bin/env python
"""Turn the unattended chip-session results into decision verdicts.

`scripts/chip_session_auto.sh` waits for the flaky tunnel and writes each
runbook step's stdout to /tmp/chip_auto/<step>.json (with a .done marker
once the output parses).  This script reads whatever has landed and applies
the CLAUDE.md measure-or-revert rule to each experiment:

  speedup >= 1.05  -> FLIP/KEEP-ON default + "What worked" entry
  speedup <= 0.95  -> keep off / revert + "Negative results" entry
  in between       -> below measurement noise; keep the current default

It only *prints* the verdicts — editing config defaults, the YAML guard
test, PERFORMANCE.md and CLAUDE.md stays a reviewed, manual change.

Usage: python scripts/chip_session_analyze.py [--state /tmp/chip_auto]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

WIN, LOSS = 1.05, 0.95


def _load_lines(path: Path) -> list:
    """All parseable JSON lines in a step's stdout (progress lines skipped)."""
    out = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line[0] not in "{[":
            continue
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return out


def _verdict(speedup: float) -> str:
    if speedup >= WIN:
        return "WIN -> default ON (+ What-worked entry)"
    if speedup <= LOSS:
        return "LOSS -> default OFF (+ Negative-results entry)"
    return "NOISE -> keep current default (note 'below measurement noise')"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/tmp/chip_auto")
    args = ap.parse_args()
    state = Path(args.state)

    def step(name: str):
        path = state / f"{name}.json"
        if not path.exists():
            print(f"[{name}] not run yet")
            return None
        done = (state / f"{name}.done").exists()
        recs = _load_lines(path)
        if not recs:
            print(f"[{name}] no parseable JSON (step crashed?)")
            return None
        if not done:
            print(f"[{name}] WARNING: no .done marker — step may be partial")
        return recs

    if recs := step("bench_r4"):
        r = recs[-1]
        print(f"[bench_r4] {r.get('value')} {r.get('unit')} "
              f"(vs_baseline {r.get('vs_baseline')}, backend {r.get('backend', 'ok')})"
              f" — r02 driver capture was 1.1743 vol/s")

    if recs := step("linkopt_sparse"):
        r = recs[-1]
        s = r["speedup"]
        print(f"[sparse_fetch] dense {r['dense_vps_median']} vs sparse "
              f"{r['sparse_vps_median']} vol/s, speedup {s}: {_verdict(s)}")

    if recs := step("linkopt_mask"):
        r = recs[-1]
        s = r["speedup"]
        print(f"[pack_mask] unpacked {r['unpacked_vps_median']} vs packed "
              f"{r['packed_vps_median']} vol/s, speedup {s}: {_verdict(s)} "
              f"(default is currently ON)")

    if recs := step("linkopt_chain"):
        by_batch: dict = {}
        for r in recs:
            if r.get("experiment") == "steps_per_dispatch":
                by_batch.setdefault(r["batch"], {})[r["k"]] = r
        for batch, ks in sorted(by_batch.items()):
            if 1 not in ks:
                print(f"[chain b{batch}] missing k=1 baseline, skipping")
                continue
            base = ks[1]["steps_per_sec_median"]
            best_k = max(ks, key=lambda k: ks[k]["steps_per_sec_median"])
            s = ks[best_k]["steps_per_sec_median"] / base
            detail = ", ".join(
                f"k={k}: {ks[k]['steps_per_sec_median']} sps "
                f"({ks[k]['step_ms']} ms)" for k in sorted(ks))
            print(f"[chain b{batch}] {detail}")
            print(f"[chain b{batch}] best k={best_k}, speedup {s:.3f} vs k=1: "
                  f"{_verdict(s)}")

    if recs := step("linkopt_pbatch"):
        rows = [r for r in recs if r.get("experiment") == "patch_batch_roofline"]
        if rows:
            base = rows[0]
            for r in rows:
                print(f"[pbatch {r['patch_batch']}] fwd "
                      f"{r['forward_ms_per_patch']} ms/patch, "
                      f"{r.get('achieved_gbps')} GB/s, e2e {r['e2e_vps_median']} vol/s")
            if len(rows) > 1:
                s = rows[-1]["e2e_vps_median"] / base["e2e_vps_median"]
                print(f"[pbatch] e2e speedup {s:.3f} "
                      f"({rows[-1]['patch_batch']} vs {base['patch_batch']}): "
                      f"{_verdict(s)}")

    if recs := step("hard_chip"):
        r = recs[-1]
        evs = r.get("selection_events", [])
        fb = r.get("val_fallback_history", [])
        hosts = sum(e.get("host", 0) for e in fb)
        esc = sum(e.get("escalated", 0) for e in fb)
        mb = sum(e.get("host_fetch_bytes", 0) for e in fb) / (1 << 20)
        lrs = r.get("learning_rate", [])
        lr_drops = sum(1 for a, b in zip(lrs, lrs[1:]) if b < a)
        print(f"[hard_chip] epochs={len(r.get('val_recall', []))}/{r.get('epochs')} "
              f"early_stopped={r.get('early_stopped')} "
              f"best_recall={r.get('best_recall')} best_dsc={r.get('best_dsc')} "
              f"(best_epoch {r.get('best_epoch')})")
        print(f"[hard_chip] selection events: "
              f"{sum(1 for e in evs if e.get('reason') == 'recall')} on recall, "
              f"{sum(1 for e in evs if e.get('reason') != 'recall')} tie-break; "
              f"lr_drops={lr_drops}; "
              f"fallbacks: escalated={esc} host={hosts} ({mb:.1f} MB fetched)")
        print(f"[hard_chip] recall trajectory: {r.get('val_recall')}")
        print(f"[hard_chip] best-threshold trajectory: {r.get('val_best_threshold')}")
        print(f"[hard_chip] epoch walls (s): "
              f"{[e.get('wall_seconds') for e in fb]}")


if __name__ == "__main__":
    main()
