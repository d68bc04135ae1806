"""Geomean of vs_matched over sweep JSONL rows (one line per config).

Usage: python scripts/sweep_geomean.py benchmarks/sweep_r04.jsonl \
           benchmarks/sweep_r05.jsonl

Later files override earlier rows with the same (model, img) key, so the
round-N sweep only needs to re-measure rows that changed; unmeasured rows
carry forward. Rows with vs_matched == null are listed but excluded.
"""

import json
import math
import re
import sys


def key_of(metric: str):
    m = re.search(r'images/sec/chip (\S+) @(\d+)', metric)
    return (m.group(1), int(m.group(2))) if m else metric


def main(paths):
    rows = {}
    for path in paths:
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                rows[key_of(row['metric'])] = row

    ratios = []
    for (model, img), row in sorted(rows.items()):
        r = row.get('vs_matched')
        mark = f'{r:.3f}' if r else 'null (excluded)'
        print(f'{model:<18} @{img}  {row["value"]:>8.1f} img/s  '
              f'vs_matched {mark}')
        if r:
            ratios.append(r)
    g = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    print(f'\ngeomean over {len(ratios)} matched rows: {g:.4f}')


if __name__ == '__main__':
    main(sys.argv[1:] or ['benchmarks/sweep_r04.jsonl',
                          'benchmarks/sweep_r05.jsonl'])
