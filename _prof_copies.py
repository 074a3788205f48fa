import glob, gzip, json, os, collections
f = sorted(glob.glob('/tmp/fitprof/**/*.trace.json.gz', recursive=True), key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))['traceEvents']
rows = []
for e in ev:
    if e.get('ph') == 'X' and e.get('dur') and 'args' in e:
        n = e['name']
        if n.startswith('copy') and not n.startswith('copy-'):
            rows.append((e['dur'], n, e['args']))
rows.sort(reverse=True)
seen = set()
for d, n, a in rows:
    if n in seen: continue
    seen.add(n)
    info = {k: v for k, v in a.items() if k in ('shape', 'layout', 'tf_op', 'source', 'long_name', 'expression')}
    print(f'{d/1000:7.3f} ms {n:12s} {info}')
    if len(seen) >= 12: break
