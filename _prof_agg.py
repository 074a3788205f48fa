import glob, gzip, json, os, collections, re
f = sorted(glob.glob('/tmp/fitprof/**/*.trace.json.gz', recursive=True), key=os.path.getmtime)[-1]
ev = json.load(gzip.open(f))['traceEvents']
cat = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get('ph') == 'X' and e.get('dur') and 'args' in e:
        n = e['name']
        if n.startswith('jit_'): continue
        base = re.sub(r'[.\d]+$', '', n)
        cat[base] += e['dur']; cnt[base] += 1
tot = sum(cat.values())
print(f'device total (2 execs): {tot/1000:.1f} ms -> {tot/2000:.1f} ms/fit')
for name, d in cat.most_common(22):
    print(f'{d/2000:8.3f} ms  x{cnt[name]//2:<4d} {name[:70]}')
