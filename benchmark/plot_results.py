"""Plot throughput sweeps from benchmark/results.db.

Usage: python benchmark/plot_results.py [--db results.db] [--out benchmark.png]
Functional analogue of the reference's plot_results.py (matplotlib figures per
suite over batch size).
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument('--db', default=os.path.join(os.path.dirname(__file__), 'results.db'))
    parser.add_argument('--out', default=os.path.join(os.path.dirname(__file__), 'benchmark.png'))
    args = parser.parse_args(argv)

    import matplotlib

    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    conn = sqlite3.connect(args.db)
    rows = conn.execute(
        'SELECT suite, config, batch_size, items_per_sec, device FROM results'
    ).fetchall()
    if not rows:
        print('no results in', args.db)
        return 1

    series: dict = {}
    for suite, config, batch, ips, device in rows:
        cfg = json.loads(config)
        label = suite + (
            ' (joints only)' if cfg.get('return_vertices') is False else ''
        )
        series.setdefault(label, {})[batch] = ips  # last write wins per batch

    fig, ax = plt.subplots(figsize=(7, 5))
    for label, pts in sorted(series.items()):
        batches = sorted(pts)
        ax.plot(batches, [pts[b] for b in batches], marker='o', label=label)
    ax.set_xscale('log', base=2)
    ax.set_yscale('log')
    ax.set_xlabel('batch size')
    ax.set_ylabel('items / s')
    ax.set_title(f'smplfitter_tpu throughput ({rows[-1][4]})')
    ax.grid(True, which='both', alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print('wrote', args.out)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
