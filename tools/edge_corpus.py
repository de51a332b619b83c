#!/usr/bin/env python3
"""Adversarial documents corpus for robustness checks (dev tool only).

The driver regenerates /root/testdata each round, so operators must hold
on data shapes the current fixtures don't contain: empty/whitespace-only
docs, single words, exact dups across sources, word permutations,
unicode, degenerate repetition. Usage:

  python3 tools/edge_corpus.py [outdir=/tmp/edge_sf]
  sbt 'runMain graft.Verify /tmp/edge_sf /tmp/edge_out'   # with SPARK_GRAFT_ONLY=text/dedup/curation keys
  python3 tools/oracle_check.py /tmp/edge_sf /tmp/edge_out
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

DOCS = [
    (0, '', 'en', 'web'),                  # empty
    (1, '   ', 'en', 'web'),               # whitespace only
    (2, 'word', 'en', 'web'),              # single word
    (3, 'word', 'en', 'books'),            # exact dup of 2, other source
    (4, 'two words', 'en', 'web'),         # below shingle n
    (5, 'the quick brown fox jumps over the lazy dog', 'en', 'web'),
    (6, 'the quick brown fox jumps over the lazy dog', 'en', 'books'),  # exact dup
    (7, 'quick the brown fox jumps over lazy the dog', 'en', 'web'),    # permuted word set
    (8, 'café naïve über straße 中文 日本語', 'zh', 'web'),
    (9, 'a a a a a a a a a a a a a a', 'en', 'web'),                    # degenerate repetition
    (10, 'x ' * 500, 'de', 'web'),                                      # long repetitive
    (11, 'the quick brown fox jumps over the lazy dog extra', 'en', 'cc'),  # near dup of 5
    (12, 'one', 'fr', 'web'),
    (13, 'deux trois', 'fr', 'cc'),
    # hot cross-source fingerprint: the same boilerplate (license header)
    # repeated m times in web and n times in books/cc — the per-doc
    # contamination self-join would materialize m*n rows here; the
    # collapsed (fp, source, n_docs) join must give identical counts
    (14, 'permission is hereby granted free of charge', 'en', 'web'),
    (15, 'permission is hereby granted free of charge', 'en', 'web'),
    (16, 'permission is hereby granted free of charge', 'en', 'web'),
    (17, 'permission is hereby granted free of charge', 'en', 'books'),
    (18, 'permission is hereby granted free of charge', 'en', 'books'),
    (19, 'permission is hereby granted free of charge', 'en', 'cc'),
    # permuted copy of the boilerplate: same bag-of-words fingerprint,
    # different text — still contamination by the bow definition
    (20, 'granted hereby permission is free charge of', 'en', 'cc'),
    # NULL text (a failed extraction) — every operator must agree with the
    # oracle on NULL propagation, not just on empty strings
    (21, None, 'en', 'web'),
]


DIM = 64


def edge_embeddings():
    """Zero vector (failed encoder), exact dup pair, near-dup pair,
    orthogonal singletons — query ids (< 10) and candidate ids."""
    import math
    def unit(axis):
        v = [0.0] * DIM
        v[axis] = 1.0
        return v
    def mix(a, b, t):
        va, vb = unit(a), unit(b)
        v = [(1 - t) * x + t * y for x, y in zip(va, vb)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]
    return [
        (0, unit(0), 0),            # query
        (1, [0.0] * DIM, 0),        # query, ZERO VECTOR
        (2, unit(1), 1),            # query
        (10, unit(0), 0),           # exact dup of 0
        (11, mix(0, 1, 0.05), 0),   # near dup of 0
        (12, unit(2), 2),           # orthogonal
        (13, [0.0] * DIM, 1),       # candidate zero vector
        (14, mix(1, 2, 0.5), 2),
        (15, None, 0),              # NULL embedding (failed encoder row)
    ]


NS = 1_000_000_000
BASE = 1704067200 * NS  # 2024-01-01T00:00:00Z


def edge_events():
    """Boundary shapes for the event-analytics family: exact session-gap
    ties, duplicate timestamps inside one user, single-event users,
    day-boundary spines, NULL value/event_type/props, decimal-heavy
    values. Written as timestamp[us] naive (the post-r7 physical layout,
    Spark TIMESTAMP_NTZ) — exercising Tables.events' normalization."""
    rows = []
    def ev(eid, uid, ts, et, val, props='{}'):
        rows.append((eid, ts, uid, et, val, props))
    # user 1: two sessions split by EXACTLY the 30-min gap (tie semantics)
    ev(1, 1, BASE, 'view', 1.0)
    ev(2, 1, BASE + 1800 * NS, 'click', 2.0)          # gap == threshold
    ev(3, 1, BASE + 3601 * NS, 'purchase', 3.0)       # second gap > threshold
    # user 2: duplicate ts — window tiebreaks must be pinned by event_id
    ev(4, 2, BASE + 60 * NS, 'view', 1.5)
    ev(5, 2, BASE + 60 * NS, 'click', 2.5)
    ev(6, 2, BASE + 60 * NS, 'view', 0.5)
    # user 3: single event (LAG/LEAD NULLs, funnel stage 1)
    ev(7, 3, BASE + 120 * NS, 'view', 9.99)
    # user 4: spans a UTC day boundary (gap-fill spine, suffix shards)
    ev(8, 4, BASE + 86350 * NS, 'view', 1.25)
    ev(9, 4, BASE + 86500 * NS, 'purchase', 100.01)   # lands on day 2
    # user 5: NULL value, NULL event_type, NULL props
    ev(10, 5, BASE + 200 * NS, 'view', None)
    ev(11, 5, BASE + 260 * NS, None, 4.0)
    ev(12, 5, BASE + 320 * NS, 'click', 5.0, None)
    # user 6: decimal-heavy values (partial-sum order sensitivity)
    for i in range(7):
        ev(13 + i, 6, BASE + (400 + i) * NS, 'view', 0.1 + i * 0.01)
    ev(20, 6, BASE + 500 * NS, 'click', 1e-9)
    D7 = 7 * 86400
    # user 7: attribution lookback boundary — a touch EXACTLY 7 days
    # before the purchase (included, >=), one inside, and one at the
    # purchase instant itself (excluded, strict <)
    ev(21, 7, BASE, 'view', 0.0)
    ev(22, 7, BASE + 1 * NS, 'click', 0.0)
    ev(23, 7, BASE + D7 * NS, 'purchase', 70.07)
    ev(24, 7, BASE + D7 * NS, 'view', 0.0)
    # user 8: purchase whose only touch is OUTSIDE the window — must
    # surface in the attribution 'direct' bucket, not vanish
    ev(25, 8, BASE, 'view', 1.0)
    ev(26, 8, BASE + (D7 + 86400) * NS, 'purchase', 9.99)
    # user 9: ISO-week boundary cohort — first event Sunday 23:59:59
    # (cohort = the Monday-start week it closes), active again the next
    # Monday at 00:00:00 → retention offset exactly 1
    ev(27, 9, BASE + (6 * 86400 + 86399) * NS, 'view', 2.0)
    ev(28, 9, BASE + D7 * NS, 'click', 2.5)
    # user 10: only NULL spends — RFM monetary must score as 0, not NULL
    ev(29, 10, BASE + 700 * NS, 'view', None)
    ev(30, 10, BASE + 800 * NS, 'click', None)
    return rows


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    tbl = pa.table({
        'doc_id': pa.array([d[0] for d in DOCS], pa.int64()),
        'text': pa.array([d[1] for d in DOCS], pa.string()),
        'lang': pa.array([d[2] for d in DOCS], pa.string()),
        'source': pa.array([d[3] for d in DOCS], pa.string()),
        'n_chars': pa.array([len(d[1]) if d[1] is not None else None for d in DOCS], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(outdir, 'documents.parquet'))
    print(f'wrote {tbl.num_rows} docs to {outdir}/documents.parquet')
    embs = edge_embeddings()
    etbl = pa.table({
        'vec_id': pa.array([e[0] for e in embs], pa.int64()),
        'embedding': pa.array([e[1] for e in embs], pa.list_(pa.float32())),
        'label': pa.array([e[2] for e in embs], pa.int32()),
    })
    pq.write_table(etbl, os.path.join(outdir, 'embeddings.parquet'))
    print(f'wrote {etbl.num_rows} embeddings to {outdir}/embeddings.parquet')
    evs = edge_events()
    vtbl = pa.table({
        'event_id': pa.array([e[0] for e in evs], pa.int64()),
        'ts': pa.array([e[1] // 1000 for e in evs], pa.timestamp('us')),
        'user_id': pa.array([e[2] for e in evs], pa.int64()),
        'event_type': pa.array([e[3] for e in evs], pa.string()),
        'value': pa.array([e[4] for e in evs], pa.float64()),
        'props': pa.array([e[5] for e in evs], pa.string()),
    })
    pq.write_table(vtbl, os.path.join(outdir, 'events.parquet'))
    print(f'wrote {vtbl.num_rows} events to {outdir}/events.parquet')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/edge_sf')
