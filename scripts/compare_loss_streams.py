"""Compare logged loss streams of two train.py runs (soak receipts).

Parses ``INFO:absl:step N: loss=X ...`` lines from two logs and reports,
over the overlapping step range (optionally restricted with --from-step),
the number of matching steps and the max |loss_a - loss_b|. Used for the
preemption-resume determinism receipt: a resumed run's post-restore
stream must equal the uninterrupted twin's at the same steps.

Usage: python scripts/compare_loss_streams.py A.log B.log [--from-step N]
"""

import argparse
import re

PAT = re.compile(rb'INFO:absl:step (\d+): loss=([0-9.eE+-]+)')


def parse(path):
    out = {}
    with open(path, 'rb') as f:
        for line in f:
            m = PAT.search(line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('log_a')
    ap.add_argument('log_b')
    ap.add_argument('--from-step', type=int, default=0)
    args = ap.parse_args()

    a, b = parse(args.log_a), parse(args.log_b)
    steps = sorted(s for s in a.keys() & b.keys() if s >= args.from_step)
    if not steps:
        print('no overlapping steps')
        raise SystemExit(1)
    diffs = [(abs(a[s] - b[s]), s) for s in steps]
    worst, worst_step = max(diffs)
    exact = sum(1 for d, _ in diffs if d == 0.0)
    print(f'{len(steps)} overlapping steps in [{steps[0]}, {steps[-1]}]; '
          f'{exact} bit-equal; max |dloss| = {worst:.3e} at step '
          f'{worst_step}')
    raise SystemExit(0 if worst < 5e-3 else 2)


if __name__ == '__main__':
    main()
