"""Aggregate a jax.profiler xplane trace into a per-scope device-time
budget (the named scopes of decode_pipeline show up as jpeggpu.*).

Usage: python scripts/profparse.py <logdir> [top_n]
"""
import glob
import json
import re
import sys


def main():
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(logdir + '/plugins/profile/*/*.xplane.pb')
    data, _ = rtd.xspace_to_tool_data(paths, 'hlo_stats', {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    rows = [[c.get('v') for c in r['c']] for r in d['rows']]
    by_scope = {}
    items = []
    tot = 0.0
    for r in rows:
        name, fw, cat = r[3], r[5] or '', r[2]
        self_us = float(r[9] or 0)
        tot += self_us
        m = re.search(r'jpeggpu\.[a-z_.]+', fw)
        scope = m.group(0) if m else (fw.split('/')[0] if fw else '?')
        by_scope[scope] = by_scope.get(scope, 0) + self_us
        items.append((self_us, name, (r[4] or '')[:150], fw[:80], cat))
    print(f"TOTAL device self time: {tot/1e3:.2f} ms")
    print("-- by scope --")
    for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1]):
        if v > 20:
            print(f"{v/1e3:9.2f} ms  {k}")
    print(f"-- top {top_n} ops --")
    for self_us, name, text, fw, cat in sorted(items, reverse=True)[:top_n]:
        print(f"{self_us/1e3:8.2f} ms  {cat:18s} {name[:40]:40s} {fw}")
        print(f"            {text}")


if __name__ == "__main__":
    sys.exit(main())
