#!/usr/bin/env python3
"""Prototype the mm_audio_adpcm DuckDB oracle against an independent
Python replay of the IMA recurrence, over the real documents table."""
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

STEP = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
        598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
        1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
        5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
        15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def ima(pred, idx, nib):
    st = STEP[idx]
    diff = st >> 3
    if nib & 1: diff += st >> 2
    if nib & 2: diff += st >> 1
    if nib & 4: diff += st
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IDX[nib & 7]))
    return pred, idx


def py_mono(doc):
    nblocks = 2 + doc % 2
    ch0 = []
    for b in range(nblocks):
        pred = (doc * 97 + b * 411) % 1024 - 512
        idx = (doc + 17 * b) % 89
        ch0.append(pred)
        for k in range(40):
            pred, idx = ima(pred, idx, (k * 7 + doc * 3 + b * 11) % 16)
            ch0.append(pred)
    zc = sum(1 for a, b2 in zip(ch0, ch0[1:]) if (a < 0) != (b2 < 0))
    return (len(ch0), sum(ch0), sum(v * v for v in ch0),
            max(abs(v) for v in ch0), zc)


def py_stereo(doc):
    groups = 4 + doc % 3
    chans = []
    for c in range(2):
        pred = (doc * 97 + c * 333) % 1024 - 512
        idx = (doc + 31 * c) % 89
        seq = [pred]
        for k in range(8 * groups):
            pred, idx = ima(pred, idx, (k * 7 + doc * 3 + c * 5) % 16)
            seq.append(pred)
        chans.append(seq)
    allv = chans[0] + chans[1]
    ch0 = chans[0]
    zc = sum(1 for a, b2 in zip(ch0, ch0[1:]) if (a < 0) != (b2 < 0))
    return (len(ch0), sum(allv), sum(v * v for v in allv),
            max(abs(v) for v in allv), zc)


SQL = """
WITH RECURSIVE steps(si, st) AS (
  SELECT * FROM (VALUES {steps}) t(si, st)
), mono(doc_id, b, i, pred, idx) AS (
  SELECT d.doc_id, b.b, 0,
         CAST((d.doc_id*97 + b.b*411) % 1024 - 512 AS INTEGER),
         CAST((d.doc_id + 17*b.b) % 89 AS INTEGER)
  FROM documents d JOIN (VALUES (0),(1),(2)) b(b) ON b.b < 2 + d.doc_id % 2
  UNION ALL
  SELECT m.doc_id, m.b, m.i + 1,
    GREATEST(-32768, LEAST(32767, m.pred
      + CASE WHEN (((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 8) != 0
             THEN -1 ELSE 1 END
      * (s.st // 8
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 1) != 0
                THEN s.st // 4 ELSE 0 END
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 2) != 0
                THEN s.st // 2 ELSE 0 END
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 4) != 0
                THEN s.st ELSE 0 END))),
    GREATEST(0, LEAST(88, m.idx
      + CASE WHEN (((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 7) < 4 THEN -1
             ELSE ((((m.i*7 + m.doc_id*3 + m.b*11) % 16) & 7) - 3) * 2 END))
  FROM mono m JOIN steps s ON s.si = m.idx
  WHERE m.i < 40
), mz AS (
  SELECT doc_id, b, i, pred,
         lag(pred) OVER (PARTITION BY doc_id ORDER BY b, i) AS pv
  FROM mono
), ma AS (
  SELECT doc_id, count(*) AS n, sum(pred) AS s, sum(pred*pred) AS q,
         max(abs(pred)) AS pk,
         sum(CASE WHEN pv IS NOT NULL AND ((pred < 0) != (pv < 0))
             THEN 1 ELSE 0 END) AS zc
  FROM mz GROUP BY doc_id
), ster(doc_id, c, i, ns, pred, idx) AS (
  SELECT d.doc_id, c.c, 0, 8 * (4 + CAST(d.doc_id % 3 AS INTEGER)),
         CAST((d.doc_id*97 + c.c*333) % 1024 - 512 AS INTEGER),
         CAST((d.doc_id + 31*c.c) % 89 AS INTEGER)
  FROM documents d JOIN (VALUES (0),(1)) c(c) ON true
  UNION ALL
  SELECT m.doc_id, m.c, m.i + 1, m.ns,
    GREATEST(-32768, LEAST(32767, m.pred
      + CASE WHEN (((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 8) != 0
             THEN -1 ELSE 1 END
      * (s.st // 8
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 1) != 0
                THEN s.st // 4 ELSE 0 END
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 2) != 0
                THEN s.st // 2 ELSE 0 END
         + CASE WHEN (((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 4) != 0
                THEN s.st ELSE 0 END))),
    GREATEST(0, LEAST(88, m.idx
      + CASE WHEN (((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 7) < 4 THEN -1
             ELSE ((((m.i*7 + m.doc_id*3 + m.c*5) % 16) & 7) - 3) * 2 END))
  FROM ster m JOIN steps s ON s.si = m.idx
  WHERE m.i < m.ns
), sz AS (
  SELECT doc_id, c, i, pred,
         lag(pred) OVER (PARTITION BY doc_id, c ORDER BY i) AS pv
  FROM ster
), sa AS (
  SELECT doc_id, count(*) // 2 AS n, sum(pred) AS s, sum(pred*pred) AS q,
         max(abs(pred)) AS pk,
         sum(CASE WHEN c = 0 AND pv IS NOT NULL
                  AND ((pred < 0) != (pv < 0)) THEN 1 ELSE 0 END) AS zc
  FROM sz GROUP BY doc_id
)
SELECT d.doc_id,
CAST(ma.n AS BIGINT) AS m_n, CAST(4 AS BIGINT) AS m_bits,
CAST(ma.s AS BIGINT) AS m_sum, CAST(ma.q AS BIGINT) AS m_sqsum,
CAST(ma.pk AS BIGINT) AS m_peak, CAST(ma.zc AS BIGINT) AS m_zc,
CAST(sa.n AS BIGINT) AS s_n, CAST(sa.s AS BIGINT) AS s_sum,
CAST(sa.q AS BIGINT) AS s_sqsum, CAST(sa.pk AS BIGINT) AS s_peak,
CAST(sa.zc AS BIGINT) AS s_zc
FROM documents d
JOIN ma ON ma.doc_id = d.doc_id
JOIN sa ON sa.doc_id = d.doc_id
ORDER BY d.doc_id
""".format(steps=",".join(f"({i},{s})" for i, s in enumerate(STEP)))

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
rows = con.execute(SQL).fetchall()
print(f"{len(rows)} rows from DuckDB")
bad = 0
for r in rows:
    doc = r[0]
    mn, msum, msq, mpk, mzc = py_mono(doc)
    sn, ssum, ssq, spk, szc = py_stereo(doc)
    exp = (doc, mn, 4, msum, msq, mpk, mzc, sn, ssum, ssq, spk, szc)
    if tuple(r) != exp:
        bad += 1
        if bad <= 3:
            print("MISMATCH", r, "expected", exp)
print("mismatches:", bad)
