#!/usr/bin/env python3
"""Local replica of the driver's correctness compare: run each oracle SQL in
DuckDB against the sf parquet tables, load the Spark result parquet, sort
columns by name + rows by all columns, and compare values. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Beyond the driver's oracle_sql.json pass, this gate also checks the
hash-based queries the driver records rows-only (xxhash64 / Scala
MurmurHash3 are not DuckDB builtins): pure-Python ports of XXH64 and Scala's
stringHash — both public, documented algorithms — recompute q_simhash,
q_simhash_pairs and q_minhash_lsh EXACTLY (validated bit-for-bit against the
Spark outputs at sf0.001/sf0.01). q_ann_ivf joined them in round 3 once its
centroid mean became order-independent (floor(x*2^32) integer sums): every
float step now has a fixed op order both runtimes share, so supp_ann_ivf
reproduces the Spark output bit-for-bit. NO query is spec-only any more.
"""
import duckdb, json, re, sys, glob
import pandas as pd

# ---------------------------------------------------------------- hashes ---
M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F; P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63; P5 = 0x27D4EB2F165667C5

def _rotl(x, r): return ((x << r) | (x >> (64 - r))) & M64

def _fmix(h):
    h ^= h >> 33; h = (h * P2) & M64
    h ^= h >> 29; h = (h * P3) & M64
    h ^= h >> 32
    return h

def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte string == Spark's xxhash64(string_col, seed)."""
    n = len(data); off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64; v2 = (seed + P2) & M64
        v3 = seed & M64; v4 = (seed - P1) & M64
        def rnd(v, k): return (_rotl((v + k * P2) & M64, 31) * P1) & M64
        while off + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[off:off+8], 'little')); off += 8
            v2 = rnd(v2, int.from_bytes(data[off:off+8], 'little')); off += 8
            v3 = rnd(v3, int.from_bytes(data[off:off+8], 'little')); off += 8
            v4 = rnd(v4, int.from_bytes(data[off:off+8], 'little')); off += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while off + 8 <= n:
        k1 = int.from_bytes(data[off:off+8], 'little')
        h ^= (_rotl((k1 * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off + 4 <= n:
        h ^= (int.from_bytes(data[off:off+4], 'little') * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)

def xxh64_long(l: int, seed: int) -> int:
    """Spark XXH64.hashLong (LongType child of xxhash64)."""
    l &= M64
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((l * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)

def xxh64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt (IntegerType child of xxhash64)."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)

def signed64(u): return u - (1 << 64) if u >= (1 << 63) else u

M32 = (1 << 32) - 1
def _rotl32(x, r): return ((x << r) | (x >> (32 - r))) & M32

def scala_string_hash(s: str, seed: int = 0xf7ca7fd2) -> int:
    """Scala MurmurHash3.stringHash: murmur3-x86-32 over char PAIRS."""
    c1, c2 = 0xcc9e2d51, 0x1b873593
    h = seed & M32
    i = 0
    while i + 1 < len(s):
        k = (((ord(s[i]) << 16) + ord(s[i+1])) * c1) & M32
        k = _rotl32(k, 15); k = (k * c2) & M32
        h ^= k; h = _rotl32(h, 13); h = (h * 5 + 0xe6546b64) & M32
        i += 2
    if i < len(s):
        k = (ord(s[i]) * c1) & M32
        k = _rotl32(k, 15); k = (k * c2) & M32
        h ^= k
    h ^= len(s) & M32
    h ^= h >> 16; h = (h * 0x85ebca6b) & M32
    h ^= h >> 13; h = (h * 0xc2b2ae35) & M32
    h ^= h >> 16
    return h

def signed32(u): return u - (1 << 32) if u >= (1 << 31) else u

JAVA_TRIM = ''.join(chr(i) for i in range(0x21))  # String.trim: chars <= 0x20
JAVA_WS = r'[ \t\n\x0b\f\r]+'  # Java regex \s (ASCII; Python \s is unicode-aware)

def java_split_ws(s):
    """Java s.split("\\s+") (limit 0): trailing empties removed, "" -> [""]."""
    toks = re.split(JAVA_WS, s)
    while len(toks) > 1 and toks[-1] == '':
        toks.pop()
    return toks

def simhash64(text):
    """graft.expr.SimhashKernel's exact semantics: Java trim (<= 0x20), Java
    \s+ split — simhash64("") hashes ONE empty token, never 0."""
    if text is None: return 0
    counts = [0] * 64
    for tok in java_split_ws(text.strip(JAVA_TRIM)):
        hi = signed32(scala_string_hash(tok))
        lo = scala_string_hash(tok[::-1])
        h = ((hi << 32) | lo) & M64
        for j in range(64):
            counts[j] += 1 if (h >> j) & 1 else -1
    out = 0
    for j in range(64):
        if counts[j] > 0: out |= 1 << j
    return signed64(out)

# -------------------------------------------- supplementary exact oracles ---
def _shingles(text, n=3):
    """graft.expr.ShingleKernel's exact semantics: SPACE-only trim, Java
    split with limit -1 (ALL empty tokens kept), first-occurrence distinct."""
    toks = re.split(JAVA_WS, text.strip(' '))
    out, seen = [], set()
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i:i+n])
        if s not in seen:
            seen.add(s); out.append(s)
    return out


# ------------------------------------------- whitespace-edge fixtures ---
# JVM ground truth (graft.expr.SimhashKernel / ShingleKernel, captured via
# a scratch main; HashEdgeFixturesSpec pins the same constants JVM-side).
# These fail loudly if the ports' tokenization drifts from the kernels.
_EDGE_SIMHASH = {
    "": 1623186167237621560,
    " ": 1623186167237621560,
    "\tfoo  bar ": 36172837473223106,
    "a\x0bb": 2328396192264757248,
    "x y x y": 2306265226510696449,
    "  leading": -7380553930011554175,
    "trailing  ": -5496704393787668268,
    "one": 804238397367804588,
}
_EDGE_SHINGLES2 = {
    "": [],
    " ": [],
    "\tfoo  bar ": [" foo", "foo bar"],
    "a\x0bb": ["a b"],
    "x y x y": ["x y", "y x"],
    "  leading": [],
    "trailing  ": [],
    "one": [],
}
for _t, _v in _EDGE_SIMHASH.items():
    assert simhash64(_t) == _v, f"simhash64 port drifted on {_t!r}: {simhash64(_t)} != {_v}"
for _t, _v in _EDGE_SHINGLES2.items():
    assert _shingles(_t, 2) == _v, f"_shingles port drifted on {_t!r}: {_shingles(_t, 2)} != {_v}"

def supp_simhash(con):
    docs = con.execute("SELECT doc_id, text FROM documents").df()
    return pd.DataFrame(
        [(r.doc_id, simhash64(r.text)) for r in docs.itertuples()],
        columns=["doc_id", "simhash"])

def supp_simhash_pairs(con, max_hamming=7):
    fp = supp_simhash(con)
    vals = list(zip(fp.doc_id, fp.simhash))
    rows = []
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            (a, fa), (b, fb) = vals[i], vals[j]
            if a > b: (a, fa), (b, fb) = (b, fb), (a, fa)
            d = bin((fa ^ fb) & M64).count("1")
            if d <= max_hamming:
                rows.append((a, b, d))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

def supp_minhash_lsh(con, n=3, numh=24, bands=4, tau=0.3, maxb=500):
    rpb = numh // bands
    docs = con.execute("SELECT doc_id, text FROM documents").df()
    sh = {}
    for r in docs.itertuples():
        s = _shingles(r.text, n)
        if s: sh[r.doc_id] = s
    seeds = [xxh64_int(i, 42) for i in range(numh)]
    buckets = {}
    for did, shs in sh.items():
        base = [xxh64_bytes(s.encode("utf-8"), 42) for s in shs]
        sig = [min(signed64(xxh64_long(h, seeds[i])) for h in base)
               for i in range(numh)]
        for b in range(bands):
            h = 42  # Spark xxhash64(array<long>): fold hashLong with running seed
            for e in sig[b*rpb:(b+1)*rpb]:
                h = xxh64_long(e, h)
            buckets.setdefault((b, signed64(h)), []).append(did)
    cand = set()
    for ids in buckets.values():
        if 1 < len(ids) <= maxb:
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i+1, len(ids)):
                    cand.add((ids[i], ids[j]))
    rows = []
    for (a, b) in cand:
        sa, sb = set(sh[a]), set(sh[b])
        common = len(sa & sb)
        jac = round(common / (len(sa) + len(sb) - common), 4)
        if jac >= tau:
            rows.append((a, b, jac))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

def _round4(x):
    """Spark round(double, 4): BigDecimal(shortest-repr).setScale(4, HALF_UP)
    then back to double — the unscaled/10^4 division is the single correctly
    rounded step both runtimes share."""
    import decimal
    q = decimal.Decimal(repr(x)).quantize(
        decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP)
    return float(q)

def supp_ann_ivf(con, n_lists=8, n_probe=4, iters=2, seed=42, k=5,
                 query_ids=range(10)):
    """Exact port of graft.ann.Similarity.ivfTopK at SparkEntry's q_ann_ivf
    parameters. Every float step replicates the JVM's op order bit-for-bit:
    sequential dot/norm loops, first-minimum centroid tie-break, the
    floor(x*2^32) order-independent centroid mean, HALF_UP 4-dp rounding.
    Keep in lockstep with Similarity.ivfTopK."""
    import math
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").df()
    # float32 -> double is exact; keep ids sorted only for reproducibility
    base = [(int(r.vec_id), [float(x) for x in r.embedding])
            for r in emb.itertuples()]
    norms = {i: math.sqrt(sum_seq(v, lambda x: x * x)) for i, v in base}
    vecs = dict(base)

    def xxh_id(i):  # Spark xxhash64(id:long, lit(seed):long), default seed 42
        return signed64(xxh64_long(seed, xxh64_long(i, 42)))

    def nearest(v, cents):
        best, best_d = -1, float("inf")
        for cid, c in cents:
            d = 0.0
            for i in range(len(c)):
                x = v[i] - c[i]
                d += x * x
            if d < best_d:
                best_d, best = d, cid
        return best

    init = sorted(vecs, key=lambda i: (xxh_id(i), i))[:n_lists]
    cents = [(ci, list(vecs[i])) for ci, i in enumerate(init)]
    scale = 4294967296.0  # 2^32
    for _ in range(iters):
        sums, cnts = {}, {}
        for i, v in vecs.items():
            c = nearest(v, cents)
            cnts[c] = cnts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(v))
            for d in range(len(v)):
                s[d] += math.floor(v[d] * scale)
        cents = [(cid, [(float(sums[cid][d]) / scale) / float(cnts[cid])
                        for d in range(len(old))] if cid in sums else old)
                 for cid, old in cents]
    cluster = {i: nearest(v, cents) for i, v in vecs.items()}

    rows = []
    for qid in query_ids:
        if qid not in vecs:
            continue
        qv, qn = vecs[qid], norms[qid]
        dists = [(sum_seq(range(len(c)),
                          lambda i: (qv[i] - c[i]) * (qv[i] - c[i])), cid)
                 for cid, c in cents]
        probes = {cid for _, cid in
                  sorted(dists, key=lambda t: t[0])[:n_probe]}
        cand = []
        for i, v in vecs.items():
            if i == qid or cluster[i] not in probes:
                continue
            dot = 0.0
            for d in range(len(v)):
                dot += qv[d] * v[d]
            cand.append((i, _round4(dot / (qn * norms[i]))))
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (i, cos) in enumerate(cand[:k], start=1):
            rows.append((qid, rank, i, cos))
    df = pd.DataFrame(rows, columns=["qid", "rank", "neighbor_id", "cosine"])
    return df.astype({"qid": "int64", "rank": "int32", "neighbor_id": "int64"})

def supp_ann_pq(con, num_sub=4, num_codes=16, iters=2, seed=42, k=5,
                query_ids=range(10)):
    """Exact port of graft.ann.Similarity.pqTopK at SparkEntry's q_ann_pq
    parameters: hash-ranked init rows shared across subspaces, per-subspace
    k-means with the floor(x*2^32) order-independent mean, first-minimum
    encoding, ADC = ascending-subspace fold of exact distance-table lookups,
    HALF_UP 4-dp rounding. Keep in lockstep with pqTopK AND
    HashOracleSql.qAnnPqSql."""
    import math
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").df()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    assert dim % num_sub == 0
    ds = dim // num_sub

    def xxh_id(i):
        return signed64(xxh64_long(seed, xxh64_long(i, 42)))

    def nearest(sv, cents):
        best, best_d = -1, float("inf")
        for cid, c in enumerate(cents):
            d = 0.0
            for i in range(len(c)):
                x = sv[i] - c[i]
                d += x * x
            if d < best_d:
                best_d, best = d, cid
        return best

    init = sorted(vecs, key=lambda i: (xxh_id(i), i))[:num_codes]
    # codebooks[m][j] = subvector m of init row j
    cbs = [[vecs[i][m * ds:(m + 1) * ds] for i in init]
           for m in range(num_sub)]
    scale = 4294967296.0  # 2^32
    for _ in range(iters):
        for m in range(num_sub):
            sums, cnts = {}, {}
            for i, v in vecs.items():
                sv = v[m * ds:(m + 1) * ds]
                c = nearest(sv, cbs[m])
                cnts[c] = cnts.get(c, 0) + 1
                s = sums.setdefault(c, [0] * ds)
                for d in range(ds):
                    s[d] += math.floor(sv[d] * scale)
            cbs[m] = [[(float(sums[j][d]) / scale) / float(cnts[j])
                       for d in range(ds)] if j in sums else old
                      for j, old in enumerate(cbs[m])]
    codes = {i: [nearest(v[m * ds:(m + 1) * ds], cbs[m])
                 for m in range(num_sub)]
             for i, v in vecs.items()}

    rows = []
    for qid in query_ids:
        if qid not in vecs:
            continue
        qv = vecs[qid]
        dt = [[sum_seq(range(ds),
                       lambda i: (qv[m * ds + i] - c[i]) * (qv[m * ds + i] - c[i]))
               for c in cbs[m]] for m in range(num_sub)]
        cand = []
        for i, cd in codes.items():
            if i == qid:
                continue
            adc = sum_seq(range(num_sub), lambda m: dt[m][cd[m]])
            cand.append((i, _round4(adc)))
        cand.sort(key=lambda t: (t[1], t[0]))
        for rank, (i, adc) in enumerate(cand[:k], start=1):
            rows.append((qid, rank, i, adc))
    df = pd.DataFrame(rows, columns=["qid", "rank", "neighbor_id", "adc"])
    return df.astype({"qid": "int64", "rank": "int32", "neighbor_id": "int64"})

def supp_ann_ivfpq(con, n_lists=8, n_probe=4, coarse_iters=2, num_sub=4,
                   num_codes=16, pq_iters=2, seed=42, k=5,
                   query_ids=range(10)):
    """Exact port of graft.ann.Similarity.ivfPqTopK at SparkEntry's
    q_ann_ivfpq parameters: the supp_ann_ivf coarse machinery (full-vector
    k-means) composed with the supp_ann_pq codebook/ADC machinery,
    candidates filtered to each query's n_probe nearest coarse lists. Keep
    in lockstep with ivfPqTopK AND HashOracleSql.qAnnIvfPqSql."""
    import math
    emb = con.execute("SELECT vec_id, embedding FROM embeddings").df()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for r in emb.itertuples()}
    dim = len(next(iter(vecs.values())))
    assert dim % num_sub == 0
    ds = dim // num_sub

    def xxh_id(i):
        return signed64(xxh64_long(seed, xxh64_long(i, 42)))

    def nearest(sv, cents):
        best, best_d = -1, float("inf")
        for cid, c in enumerate(cents):
            d = 0.0
            for i in range(len(c)):
                x = sv[i] - c[i]
                d += x * x
            if d < best_d:
                best_d, best = d, cid
        return best

    ranked = sorted(vecs, key=lambda i: (xxh_id(i), i))
    scale = 4294967296.0  # 2^32

    def kmeans(cbs, iters, lo, width):
        for _ in range(iters):
            sums, cnts = {}, {}
            for i, v in vecs.items():
                sv = v[lo:lo + width]
                c = nearest(sv, cbs)
                cnts[c] = cnts.get(c, 0) + 1
                s = sums.setdefault(c, [0] * width)
                for d in range(width):
                    s[d] += math.floor(sv[d] * scale)
            cbs = [[(float(sums[j][d]) / scale) / float(cnts[j])
                    for d in range(width)] if j in sums else old
                   for j, old in enumerate(cbs)]
        return cbs

    coarse = kmeans([list(vecs[i]) for i in ranked[:n_lists]],
                    coarse_iters, 0, dim)
    cbs = [kmeans([vecs[i][m * ds:(m + 1) * ds] for i in ranked[:num_codes]],
                  pq_iters, m * ds, ds) for m in range(num_sub)]
    cluster = {i: nearest(v, coarse) for i, v in vecs.items()}
    codes = {i: [nearest(v[m * ds:(m + 1) * ds], cbs[m])
                 for m in range(num_sub)]
             for i, v in vecs.items()}

    rows = []
    for qid in query_ids:
        if qid not in vecs:
            continue
        qv = vecs[qid]
        dists = [(sum_seq(range(len(c)),
                          lambda i: (qv[i] - c[i]) * (qv[i] - c[i])), cid)
                 for cid, c in enumerate(coarse)]
        probes = {cid for _, cid in
                  sorted(dists, key=lambda t: t[0])[:n_probe]}
        dt = [[sum_seq(range(ds),
                       lambda i: (qv[m * ds + i] - c[i]) * (qv[m * ds + i] - c[i]))
               for c in cbs[m]] for m in range(num_sub)]
        cand = []
        for i, cd in codes.items():
            if i == qid or cluster[i] not in probes:
                continue
            adc = sum_seq(range(num_sub), lambda m: dt[m][cd[m]])
            cand.append((i, _round4(adc)))
        cand.sort(key=lambda t: (t[1], t[0]))
        for rank, (i, adc) in enumerate(cand[:k], start=1):
            rows.append((qid, rank, i, adc))
    df = pd.DataFrame(rows, columns=["qid", "rank", "neighbor_id", "adc"])
    return df.astype({"qid": "int64", "rank": "int32", "neighbor_id": "int64"})

def sum_seq(xs, f):
    """Strict left-to-right double fold — the JVM loop order."""
    s = 0.0
    for x in xs:
        s += f(x)
    return s

def _kth_denominator(kth_unsigned):
    """Exact JVM chain for the KMV estimate denominator: Scala/DuckDB compute
    double(SIGNED kth) + 2^64-when-negative — two double ops — not
    double(unsigned kth) in one step. float(unsigned) rounds once where the
    JVM rounds the signed value first, so hashes within half an ulp of a
    rounding boundary could diverge; mirror the two-step chain exactly."""
    sk = signed64(kth_unsigned)
    return float(sk) + (1.8446744073709552e19 if sk < 0 else 0.0)

def supp_kmv_distinct(con, k=64):
    """Exact port of graft.agg.Sketches.kmvDistinct(documents.text, k=64):
    XXH64(seed 42) over distinct texts, k smallest unsigned, (k-1)*2^64/h_k."""
    texts = [r[0] for r in con.execute(
        "SELECT DISTINCT text FROM documents WHERE text IS NOT NULL").fetchall()]
    hs = sorted({xxh64_bytes(t.encode("utf-8"), 42) for t in texts})[:k]
    n_kept = len(hs)
    kth = hs[-1]
    est = float(n_kept) if n_kept < k else \
        (k - 1) * 1.8446744073709552e19 / _kth_denominator(kth)
    import decimal
    est2 = float(decimal.Decimal(repr(est)).quantize(
        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP))
    return pd.DataFrame([(n_kept, signed64(kth), est2)],
                        columns=["n_kept", "kth_hash", "est"])

def supp_kmv_grouped(con, k=64):
    """Exact port of graft.agg.Sketches.kmvDistinctBy(documents, [source],
    text, k=64): per-source bottom-k of XXH64(seed 42) over distinct texts."""
    rows = con.execute(
        "SELECT DISTINCT source, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    groups = {}
    for g, t in rows:
        groups.setdefault(g, set()).add(xxh64_bytes(t.encode("utf-8"), 42))
    import decimal
    out = []
    for g, hset in groups.items():
        hs = sorted(hset)[:k]
        n_kept = len(hs)
        kth = hs[-1]
        est = float(n_kept) if n_kept < k else \
            (k - 1) * 1.8446744073709552e19 / _kth_denominator(kth)
        est2 = float(decimal.Decimal(repr(est)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP))
        out.append((g, n_kept, signed64(kth), est2))
    return pd.DataFrame(out, columns=["source", "n_kept", "kth_hash", "est"])

def supp_domain_mix(con):
    """Exact port of graft.agg.Preprocessing.mixtureSample as pinned at the
    q_domain_mix call site (weights src0..src3 = .5/.3/.2/5.0, budget 4000,
    tokenCol n_chars): thr_d = floor(min(1, (w_d*budget)/tot_d) * 2^53) with
    Python-float (= IEEE-double, same op order) arithmetic; keep iff
    xxh64_long(doc_id, 42) >> 11 < thr_d."""
    import math
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2, "src3": 5.0}
    budget = 4000.0
    rows = con.execute("SELECT doc_id, source, n_chars FROM documents").fetchall()
    tot = {}
    for _, s, n in rows:
        tot[s] = tot.get(s, 0) + n
    thr = {s: math.floor(min(1.0, (w * budget) / float(tot[s]))
                         * 9007199254740992.0)
           for s, w in weights.items() if s in tot}
    out = [(i, s, n) for i, s, n in rows
           if s in thr and (xxh64_long(i, 42) >> 11) < thr[s]]
    return pd.DataFrame(out, columns=["doc_id", "source", "n_chars"])

def supp_split_assign(con):
    """Exact port of graft.agg.Preprocessing.splitByHash as pinned at the
    q_split_assign call site (train/val/test = .8/.1/.1): boundary longs via
    the splitBounds float chain (running sum, /tot, *2^53, floor — Python
    float == IEEE double, same op order); split = first boundary the top-53
    hash bits fall under, last split takes the rest."""
    import math
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    tot = sum(w for _, w in splits)
    cums, run = [], 0.0
    for _, w in splits:
        run = run + w
        cums.append(run)
    bounds = [math.floor(c / tot * 9007199254740992.0) for c in cums[:-1]]
    rows = con.execute("SELECT doc_id FROM documents").fetchall()
    out = []
    for (i,) in rows:
        u = xxh64_long(i, 42) >> 11
        name = splits[-1][0]
        for b, (nm, _) in zip(bounds, splits):
            if u < b:
                name = nm
                break
        out.append((i, name))
    return pd.DataFrame(out, columns=["doc_id", "split"])

def supp_stratified_sample(con, n=20):
    """Exact port of graft.agg.Preprocessing.stratifiedExactN as pinned at
    the q_stratified_sample call site: per source, the n rows smallest in
    (unsigned xxh64(doc_id, 42), doc_id) order, 1-based rank."""
    rows = con.execute("SELECT doc_id, source FROM documents").fetchall()
    groups = {}
    for i, g in rows:
        groups.setdefault(g, []).append((xxh64_long(i, 42), i))
    out = []
    for g, hs in groups.items():
        for rank, (_, i) in enumerate(sorted(hs)[:n], start=1):
            out.append((g, i, rank))
    return pd.DataFrame(out, columns=["source", "doc_id", "smp_rank"])

def supp_mixture_epochs(con):
    """Exact port of graft.agg.Preprocessing.mixtureUpsample as pinned at
    the q_mixture_epochs call site (src3/src7/src1 = .5/.3/.05, budget
    500000): rate = (w*budget)/tot UNCAPPED, copies = floor(rate),
    thr = floor((rate - copies) * 2^53); each row fans out to copies + gate
    epochs with the same top-53-bit hash gate as supp_domain_mix."""
    import math
    weights = {"src3": 0.5, "src7": 0.3, "src1": 0.05}
    budget = 500000.0
    rows = con.execute("SELECT doc_id, source, n_chars FROM documents").fetchall()
    tot = {}
    for _, s, n in rows:
        tot[s] = tot.get(s, 0) + n
    plan = {}
    for s, w in weights.items():
        if s not in tot:
            continue
        rate = (w * budget) / float(tot[s])
        copies = math.floor(rate)
        plan[s] = (copies, math.floor((rate - copies) * 9007199254740992.0))
    out = []
    for i, s, n in rows:
        if s not in plan:
            continue
        copies, thr = plan[s]
        cnt = copies + (1 if (xxh64_long(i, 42) >> 11) < thr else 0)
        out.extend((i, s, n, e) for e in range(cnt))
    return pd.DataFrame(out, columns=["doc_id", "source", "n_chars", "epoch"])

def supp_kmv_jaccard(con, k=64):
    """Exact port of graft.agg.Sketches.kmvJaccardPairs over kmvSketchBy
    token sketches as pinned at the q_kmv_jaccard call site: per-source
    bottom-k of XXH64(seed 42) over distinct whitespace tokens, then the
    Beyer et al. combine (U = bottom-k of the union; j_num = |U ∩ A ∩ B|,
    j_den = |U|), jacc rounded HALF_UP 6dp on the same IEEE division, and
    the shared (k-1)*2^64/h_k union estimator rounded 2dp."""
    import decimal
    rows = con.execute(
        "SELECT DISTINCT source, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    toks = {}
    for g, t in rows:
        toks.setdefault(g, set()).update(t.split())
    sketch = {g: sorted({xxh64_bytes(w.encode("utf-8"), 42) for w in ws})[:k]
              for g, ws in toks.items()}
    out = []
    for g1 in sorted(sketch):
        for g2 in sorted(sketch):
            if not g1 < g2:
                continue
            a, b = set(sketch[g1]), set(sketch[g2])
            u = sorted(a | b)[:k]
            num = sum(1 for h in u if h in a and h in b)
            den = len(u)
            jacc = float(decimal.Decimal(repr(num / den)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP))
            est = float(den) if den < k else \
                (k - 1) * 1.8446744073709552e19 / _kth_denominator(u[-1])
            est2 = float(decimal.Decimal(repr(est)).quantize(
                decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP))
            out.append((g1, g2, num, den, jacc, est2))
    return pd.DataFrame(
        out, columns=["g1", "g2", "j_num", "j_den", "jacc", "est_union"])

def _classifier_scores(con, num_buckets=4096, mul=2654435761, mod=2001):
    """Exact port of graft.text.Classifier.hashedLinearScore over documents:
    unigrams (nonempty whitespace tokens) + bigrams with multiplicity, each
    gram hashed XXH64(seed 42), bucket = low bits, weight =
    (bucket*mul) % mod - 1000 (all nonneg integer ops), per-doc integer sum;
    zero-gram docs drop. Returns {doc_id: (n_feats, score_micro)}."""
    import re as _re
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    wcache = {}
    out = {}
    for i, t in rows:
        toks = _re.split(r"\s+", t.strip()) if t is not None else [""]
        grams = [w for w in toks if w != ""]
        grams += [toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)]
        if not grams:
            continue
        s = 0
        for g in grams:
            w = wcache.get(g)
            if w is None:
                b = xxh64_bytes(g.encode("utf-8"), 42) & (num_buckets - 1)
                w = (b * mul) % mod - 1000
                wcache[g] = w
            s += w
        out[i] = (len(grams), s)
    return out

def supp_quality_classifier(con):
    """[py] face of q_quality_classifier (guards the Scala kernel and the
    generated SQL from drifting together)."""
    sc = _classifier_scores(con)
    out = [(i, n, s, 1 if s > 0 else 0) for i, (n, s) in sc.items()]
    return pd.DataFrame(out,
        columns=["doc_id", "n_feats", "score_micro", "label"])

def supp_weighted_sample(con):
    """Exact port of q_weighted_sample: min-max-normalize the classifier
    scores (all-exact integer inputs through IEEE double subtract/divide),
    keep iff the top-53 hash bits beat floor(clamp01(rate)*2^53)."""
    import math
    sc = _classifier_scores(con)
    mn = min(s for _, s in sc.values())
    mx = max(s for _, s in sc.values())
    out = []
    for i, (_, s) in sc.items():
        rate = float(s - mn) / float(mx - mn) if mx > mn else 1.0
        thr = math.floor(min(1.0, max(0.0, rate)) * 9007199254740992.0)
        if (xxh64_long(i, 42) >> 11) < thr:
            out.append((i, s))
    return pd.DataFrame(out, columns=["doc_id", "score_micro"])

def supp_negative_sample(con, k=5):
    """Exact port of graft.agg.Preprocessing.negativeSample as pinned at the
    q_negative_sample call site: ring order (unsigned xxh64(doc_id, 42),
    doc_id); negatives = the k following ring positions mod N."""
    rows = con.execute("SELECT doc_id FROM documents").fetchall()
    ring = sorted((xxh64_long(i, 42), i) for (i,) in rows)
    ids = [i for _, i in ring]
    n = len(ids)
    out = []
    for pos, a in enumerate(ids):
        out.extend((a, j, ids[(pos + j) % n]) for j in range(1, k + 1))
    return pd.DataFrame(out, columns=["anchor_id", "neg_rank", "neg_id"])

SUPPLEMENTARY = {
    "q_quality_classifier": supp_quality_classifier,
    "q_weighted_sample": supp_weighted_sample,
    "q_negative_sample": supp_negative_sample,
    "q_split_assign": supp_split_assign,
    "q_stratified_sample": supp_stratified_sample,
    "q_mixture_epochs": supp_mixture_epochs,
    "q_kmv_jaccard": supp_kmv_jaccard,
    "q_domain_mix": supp_domain_mix,
    "q_kmv_distinct": supp_kmv_distinct,
    "q_kmv_grouped": supp_kmv_grouped,
    "q_simhash": supp_simhash,
    "q_simhash_pairs": supp_simhash_pairs,
    "q_minhash_lsh": supp_minhash_lsh,
    "q_ann_ivf": supp_ann_ivf,
    "q_ann_pq": supp_ann_pq,
    "q_ann_ivfpq": supp_ann_ivfpq,
}

# ------------------------------------------------------------------ main ---
def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def compare(q, odf, sdf, tag=""):
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {q}{tag}: columns oracle={list(o.columns)} spark={list(s.columns)}")
        return False
    if len(o) != len(s):
        print(f"FAIL {q}{tag}: rows oracle={len(o)} spark={len(s)}")
        return False
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
        print(f"OK   {q}{tag}: {len(o)} rows")
        return True
    except AssertionError as e:
        print(f"FAIL {q}{tag}: value mismatch: {str(e)[:400]}")
        return False

if __name__ == "__main__":
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    ok = fail = 0
    for q, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out}/{q}/*.parquet")])
        except Exception as e:
            print(f"FAIL {q}: {type(e).__name__}: {e}")
            fail += 1
            continue
        if compare(q, odf, sdf): ok += 1
        else: fail += 1

    for q, fn in sorted(SUPPLEMENTARY.items()):
        # run even when q also has a SQL oracle: the [py] pass guards the
        # SQL CTE and the Scala kernel from drifting together
        files = glob.glob(f"{out}/{q}/*.parquet")
        if not files:
            continue
        try:
            odf = fn(con)
            sdf = pd.concat([pd.read_parquet(f) for f in files])
        except Exception as e:
            print(f"FAIL {q}[py]: {type(e).__name__}: {e}")
            fail += 1
            continue
        if compare(q, odf, sdf, "[py]"): ok += 1
        else: fail += 1

    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)
