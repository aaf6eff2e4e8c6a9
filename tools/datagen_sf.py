"""Regenerate the driver's deterministic synthetic testdata at any sf.

Reverse-engineered from /root/testdata/sf{0.001,0.01,0.1}: one
np.random.default_rng(42) stream, tables drawn in order
customer, supplier, part, orders, lineitem, events, documents
(texts then a 5% clone pass appending ' dup'). Exact-stream for every
column EXCEPT documents.lang and the embeddings table, which did not
yield to stream reconstruction and are generated from a side stream
with fitted marginals (lang p=[0.4,.15,.15,.15,.15]; embeddings =
normalize(0.145*center[label]+noise)). Validate with validate().

Usage: python datagen.py <sf> <outdir>
"""
import sys, json, datetime
import numpy as np
import pandas as pd

SEGS = ['BUILDING', 'AUTOMOBILE', 'MACHINERY', 'HOUSEHOLD', 'FURNITURE']
ADJ = ['red', 'blue', 'small', 'large', 'hot', 'cold', 'old', 'new']
NOUN = ['anvil', 'widget', 'gizmo', 'bolt', 'gear', 'plate', 'rod', 'ring']
PTYPES = ['STANDARD', 'SMALL', 'MEDIUM', 'LARGE', 'ECONOMY', 'PROMO']
STATUS = ['O', 'F', 'P']
PRIOS = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
RFLAG = ['R', 'A', 'N']
LSTAT = ['O', 'F']
ETYPES = ['click', 'view', 'purchase', 'signup', 'error']
LANGS = ['en', 'zh', 'es', 'fr', 'de']
VOCAB = ['the', 'a', 'spark', 'query', 'table', 'join', 'group', 'filter',
         'window', 'data', 'order', 'customer', 'part', 'line', 'fast',
         'slow', 'big', 'small', 'hash', 'sort', 'merge', 'scan', 'agg',
         'stream', 'batch', 'vector', 'key', 'value', 'row', 'column']
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']
BASE95 = datetime.datetime(1995, 1, 1)
BASE24 = datetime.datetime(2024, 1, 1)


def counts(sf):
    return dict(
        nc=int(150000 * sf), ns=int(10000 * sf), np_=int(200000 * sf),
        no=int(1500000 * sf), nl=int(6000000 * sf), ne=int(1000000 * sf),
        nu=int(15000 * sf), nd=max(500, int(50000 * sf)),
        nv=max(500, int(20000 * sf)))


def generate(sf):
    c = counts(sf)
    r = np.random.default_rng(42)
    out = {}
    out['region'] = pd.DataFrame({
        'r_regionkey': np.arange(5, dtype=np.int32),
        'r_name': REGIONS})
    out['nation'] = pd.DataFrame({
        'n_nationkey': np.arange(25, dtype=np.int32),
        'n_name': [f'NATION_{i}' for i in range(25)],
        'n_regionkey': (np.arange(25) % 5).astype(np.int32)})
    # customer
    nc = c['nc']
    out['customer'] = pd.DataFrame({
        'c_custkey': np.arange(nc),
        'c_name': [f'Customer#{i:09d}' for i in range(nc)],
        'c_nationkey': r.integers(0, 25, nc).astype(np.int32),
        'c_acctbal': np.round(r.uniform(-999.99, 9999.99, nc), 2),
        'c_mktsegment': r.choice(SEGS, nc)})
    # supplier
    ns = c['ns']
    out['supplier'] = pd.DataFrame({
        's_suppkey': np.arange(ns),
        's_name': [f'Supplier#{i:09d}' for i in range(ns)],
        's_nationkey': r.integers(0, 25, ns).astype(np.int32),
        's_acctbal': np.round(r.uniform(-999.99, 9999.99, ns), 2)})
    # part
    np_ = c['np_']
    adj = np.array(ADJ)[r.integers(0, 8, np_)]
    noun = np.array(NOUN)[r.integers(0, 8, np_)]
    brand = r.integers(0, 25, np_) + 1
    ptype = np.array(PTYPES)[r.integers(0, 6, np_)]
    psize = (r.integers(0, 50, np_) + 1).astype(np.int32)
    out['part'] = pd.DataFrame({
        'p_partkey': np.arange(np_),
        'p_name': [f'{a} {n}' for a, n in zip(adj, noun)],
        'p_brand': [f'Brand#{b}' for b in brand],
        'p_type': ptype, 'p_size': psize,
        'p_retailprice': np.round(900 + (np.arange(np_) % 1000) / 10.0, 2)})
    # orders
    no = c['no']
    ck = r.integers(0, nc, no)
    ost = np.array(STATUS)[r.integers(0, 3, no)]
    tp = np.round(r.uniform(1000, 500000, no), 2)
    od = r.integers(0, 2405, no)
    pr = np.array(PRIOS)[r.integers(0, 5, no)]
    out['orders'] = pd.DataFrame({
        'o_orderkey': np.arange(no), 'o_custkey': ck, 'o_orderstatus': ost,
        'o_totalprice': tp,
        'o_orderdate': pd.to_datetime(BASE95) + pd.to_timedelta(od, unit='D'),
        'o_orderpriority': pr})
    # lineitem
    nl = c['nl']
    lo = r.integers(0, no, nl)
    lp = r.integers(0, np_, nl)
    ls_ = r.integers(0, ns, nl)
    ln = r.integers(1, 8, nl).astype(np.int32)
    lq = r.integers(1, 51, nl).astype(float)
    le = np.round(r.uniform(900, 105000, nl), 2)
    ld = np.round(r.uniform(0, 0.1, nl), 2)
    lt = np.round(r.uniform(0, 0.08, nl), 2)
    rf = np.array(RFLAG)[r.integers(0, 3, nl)]
    lst = np.array(LSTAT)[r.integers(0, 2, nl)]
    sd = r.integers(1, 2500, nl)
    out['lineitem'] = pd.DataFrame({
        'l_orderkey': lo, 'l_partkey': lp, 'l_suppkey': ls_,
        'l_linenumber': ln, 'l_quantity': lq, 'l_extendedprice': le,
        'l_discount': ld, 'l_tax': lt, 'l_returnflag': rf,
        'l_linestatus': lst,
        'l_shipdate': pd.to_datetime(BASE95) + pd.to_timedelta(sd, unit='D')})
    # events
    ne = c['ne']
    secs = np.sort(r.uniform(0, 30 * 86400, ne))
    uid = r.integers(0, c['nu'], ne)
    et = np.array(ETYPES)[r.integers(0, 5, ne)]
    val = np.round(r.exponential(50, ne), 2)
    k = r.integers(0, 100, ne)
    out['events'] = pd.DataFrame({
        'event_id': np.arange(ne),
        'ts': pd.to_datetime(BASE24) + pd.to_timedelta(
            np.floor(secs * 1e9).astype(np.int64) // 1000, unit='us'),
        'user_id': uid, 'event_type': et, 'value': val,
        'props': [f'{{"k": {x}}}' for x in k]})
    # documents: per-doc texts, then clone pass
    nd = c['nd']
    V = np.array(VOCAB)
    texts = []
    for i in range(nd):
        L = r.integers(10, 100)
        texts.append(' '.join(V[r.integers(0, 30, L)]))
    kclone = int(nd * 0.05)
    targets = r.choice(nd, kclone, replace=False)
    sources = r.integers(0, nd, kclone)
    for t, s in zip(targets, sources):
        texts[t] = texts[s] + ' dup'
    # lang: NOT stream-exact (mechanism unrecovered); fitted marginal
    r2 = np.random.default_rng(4242)
    lang = r2.choice(LANGS, nd, p=[0.4, 0.15, 0.15, 0.15, 0.15])
    out['documents'] = pd.DataFrame({
        'doc_id': np.arange(nd), 'text': texts, 'lang': lang,
        'source': [f'src{i % 20}' for i in range(nd)],
        'n_chars': [len(t) for t in texts]})
    # embeddings: NOT stream-exact; fitted structure
    nv = c['nv']
    C = r2.standard_normal((10, 64))
    lab = r2.integers(0, 10, nv)
    X = 0.145 * C[lab] + r2.standard_normal((nv, 64))
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    out['embeddings'] = pd.DataFrame({
        'vec_id': np.arange(nv),
        'embedding': [row for row in X],
        'label': lab.astype(np.int32)})
    return out


def write(tables, outdir):
    import pyarrow as pa, pyarrow.parquet as pq, os
    os.makedirs(outdir, exist_ok=True)
    for name, df in tables.items():
        if name == 'embeddings':
            t = pa.table({
                'vec_id': pa.array(df.vec_id.values),
                'embedding': pa.array(
                    [list(map(float, v)) for v in df.embedding],
                    type=pa.list_(pa.float32())),
                'label': pa.array(df.label.values, type=pa.int32())})
        else:
            t = pa.Table.from_pandas(df, preserve_index=False)
            for i, f in enumerate(t.schema):
                if pa.types.is_timestamp(f.type):
                    t = t.set_column(
                        i, f.name, t.column(i).cast(pa.timestamp('us')))
        pq.write_table(t, f'{outdir}/{name}.parquet')
    open(f'{outdir}/_DONE', 'w').close()


def validate(sf, refdir):
    import pyarrow.parquet as pq
    gen = generate(sf)
    report = {}
    for name in ['region', 'nation', 'customer', 'supplier', 'part',
                 'orders', 'lineitem', 'events']:
        ref = pq.read_table(f'{refdir}/{name}.parquet').to_pandas()
        g = gen[name]
        ok = len(ref) == len(g) and all(
            (g[c].values == ref[c].values).all() for c in ref.columns)
        report[name] = bool(ok)
    ref = pq.read_table(f'{refdir}/documents.parquet').to_pandas()
    g = gen['documents']
    report['documents.text'] = bool((g.text.values == ref.text.values).all())
    report['documents.lang'] = 'approx'
    report['embeddings'] = 'approx'
    return report


if __name__ == '__main__':
    if sys.argv[1] == 'validate':
        print(json.dumps(validate(float(sys.argv[2]), sys.argv[3])))
    else:
        sf = float(sys.argv[1])
        write(generate(sf), sys.argv[2])
        print('written', sys.argv[2])
