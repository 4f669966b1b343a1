#!/usr/bin/env python3
"""Dev prototype for q_dissolve_rings: boundary-edge-cancellation set ->
ring vertex sequences via a deterministic rightmost-turn walk.
Implements the walk twice — in Python (the Scala kernel's spec) and as a
DuckDB recursive CTE (the oracle) — and diffs them on sf0.01 nation data.
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

POLY = """SELECT CAST(n_nationkey AS BIGINT) AS pid,
  CAST(n_regionkey AS BIGINT) AS rkey,
  n_name AS name,
  CAST(n_nationkey % 5 AS DOUBLE) * 20.0 AS x0,
  CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 20.0 AS y0,
  CAST(n_nationkey % 5 AS DOUBLE) * 20.0 + 20.0 AS x1,
  CAST(FLOOR(n_nationkey / 5) AS DOUBLE) * 20.0 + 20.0 AS y1
FROM nation"""


def python_walk(edges):
    """edges: list of (ex0,ey0,ex1,ey1), normalized (first pt lexicographic
    min). Returns [(ring, vi, x, y)]. Rightmost-turn walk, see design:
    start at min unused edge, walk from its (ex0,ey0) toward (ex1,ey1);
    at each vertex pick unused incident edge by turn priority
    right(0) < straight(1) < left(2), tie -> smaller edge index."""
    es = sorted(edges)
    n = len(es)
    used = [False] * n
    used_count = 0
    out = []
    ring = -1
    while used_count < n:
        i0 = next(i for i in range(n) if not used[i])
        ring += 1
        sx, sy = es[i0][0], es[i0][1]
        out.append((ring, 0, sx, sy))
        dx = (es[i0][2] > es[i0][0]) - (es[i0][2] < es[i0][0])
        dy = (es[i0][3] > es[i0][1]) - (es[i0][3] < es[i0][1])
        cx, cy = es[i0][2], es[i0][3]
        used[i0] = True
        used_count += 1
        vi = 1
        while not (cx == sx and cy == sy):
            best, best_score = -1, 9
            best_state = None
            for i in range(n):
                if used[i]:
                    continue
                ex0, ey0, ex1, ey1 = es[i]
                if ex0 == cx and ey0 == cy:
                    tox, toy = ex1, ey1
                elif ex1 == cx and ey1 == cy:
                    tox, toy = ex0, ey0
                else:
                    continue
                odx = (tox > cx) - (tox < cx)
                ody = (toy > cy) - (toy < cy)
                if (odx, ody) == (dy, -dx):
                    score = 0
                elif (odx, ody) == (dx, dy):
                    score = 1
                elif (odx, ody) == (-dy, dx):
                    score = 2
                else:
                    score = 3
                if score < best_score:
                    best, best_score = i, score
                    best_state = (odx, ody, tox, toy)
            assert best >= 0, f"stuck at ({cx},{cy})"
            out.append((ring, vi, cx, cy))
            vi += 1
            used[best] = True
            used_count += 1
            dx, dy, cx, cy = best_state
    return out


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF}/nation.parquet')")
    # boundary edges per rkey (cancellation)
    edges_sql = f"""WITH poly AS ({POLY}),
edges0 AS (
  SELECT rkey, UNNEST([
    {{'ex0': x0, 'ey0': y0, 'ex1': x1, 'ey1': y0}},
    {{'ex0': x0, 'ey0': y1, 'ex1': x1, 'ey1': y1}},
    {{'ex0': x0, 'ey0': y0, 'ex1': x0, 'ey1': y1}},
    {{'ex0': x1, 'ey0': y0, 'ex1': x1, 'ey1': y1}}]) AS e
  FROM poly)
SELECT rkey, e.ex0, e.ey0, e.ex1, e.ey1
FROM edges0 GROUP BY rkey, e HAVING COUNT(*) = 1"""
    rows = con.execute(edges_sql).fetchall()
    by_key = {}
    for rkey, *e in rows:
        by_key.setdefault(rkey, []).append(tuple(e))
    expected = []
    for rkey in sorted(by_key):
        for ring, vi, x, y in python_walk(by_key[rkey]):
            expected.append((rkey, ring, vi, x, y))

    # DuckDB recursive-CTE twin
    walk_sql = f"""WITH RECURSIVE poly AS ({POLY}),
edges0 AS (
  SELECT rkey, UNNEST([
    {{'ex0': x0, 'ey0': y0, 'ex1': x1, 'ey1': y0}},
    {{'ex0': x0, 'ey0': y1, 'ex1': x1, 'ey1': y1}},
    {{'ex0': x0, 'ey0': y0, 'ex1': x0, 'ey1': y1}},
    {{'ex0': x1, 'ey0': y0, 'ex1': x1, 'ey1': y1}}]) AS e
  FROM poly),
uniq AS (SELECT rkey, e FROM edges0 GROUP BY rkey, e HAVING COUNT(*) = 1),
el AS MATERIALIZED (
  SELECT rkey, list(e ORDER BY e.ex0, e.ey0, e.ex1, e.ey1) AS es
  FROM uniq GROUP BY rkey),
walk AS (
  SELECT rkey, es,
    CAST([] AS BIGINT[]) AS used,
    -1 AS ring, 0 AS vi,
    CAST(NULL AS DOUBLE) AS cx, CAST(NULL AS DOUBLE) AS cy,
    0 AS dx, 0 AS dy,
    CAST(NULL AS DOUBLE) AS sx, CAST(NULL AS DOUBLE) AS sy,
    CAST(NULL AS DOUBLE) AS vx, CAST(NULL AS DOUBLE) AS vy
  FROM el
  UNION ALL
  SELECT rkey, es,
    list_append(used, pick) AS used,
    CASE WHEN starting THEN ring + 1 ELSE ring END AS ring,
    CASE WHEN starting THEN 0 ELSE vi + 1 END AS vi,
    CASE WHEN starting THEN es[pick].ex1
         WHEN es[pick].ex0 = cx AND es[pick].ey0 = cy THEN es[pick].ex1
         ELSE es[pick].ex0 END AS cx,
    CASE WHEN starting THEN es[pick].ey1
         WHEN es[pick].ex0 = cx AND es[pick].ey0 = cy THEN es[pick].ey1
         ELSE es[pick].ey0 END AS cy,
    CASE WHEN starting OR (es[pick].ex0 = cx AND es[pick].ey0 = cy)
         THEN CAST(SIGN(es[pick].ex1 - es[pick].ex0) AS INT)
         ELSE CAST(SIGN(es[pick].ex0 - es[pick].ex1) AS INT) END AS dx,
    CASE WHEN starting OR (es[pick].ex0 = cx AND es[pick].ey0 = cy)
         THEN CAST(SIGN(es[pick].ey1 - es[pick].ey0) AS INT)
         ELSE CAST(SIGN(es[pick].ey0 - es[pick].ey1) AS INT) END AS dy,
    CASE WHEN starting THEN es[pick].ex0 ELSE sx END AS sx,
    CASE WHEN starting THEN es[pick].ey0 ELSE sy END AS sy,
    CASE WHEN starting THEN es[pick].ex0 ELSE cx END AS vx,
    CASE WHEN starting THEN es[pick].ey0 ELSE cy END AS vy
  FROM (
    SELECT *,
      (cx IS NULL OR (cx = sx AND cy = sy)) AS starting,
      CASE WHEN cx IS NULL OR (cx = sx AND cy = sy)
        THEN list_min(list_filter(range(1, len(es) + 1),
               i -> NOT list_contains(used, i)))
        ELSE list_min(list_transform(
               list_filter(range(1, len(es) + 1),
                 i -> NOT list_contains(used, i)
                      AND ((es[i].ex0 = cx AND es[i].ey0 = cy)
                        OR (es[i].ex1 = cx AND es[i].ey1 = cy))),
               i -> (CASE
                 WHEN (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ex1 - es[i].ex0) AS INT)
                            ELSE CAST(SIGN(es[i].ex0 - es[i].ex1) AS INT) END) = dy
                  AND (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ey1 - es[i].ey0) AS INT)
                            ELSE CAST(SIGN(es[i].ey0 - es[i].ey1) AS INT) END) = -dx
                 THEN 0
                 WHEN (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ex1 - es[i].ex0) AS INT)
                            ELSE CAST(SIGN(es[i].ex0 - es[i].ex1) AS INT) END) = dx
                  AND (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ey1 - es[i].ey0) AS INT)
                            ELSE CAST(SIGN(es[i].ey0 - es[i].ey1) AS INT) END) = dy
                 THEN 1
                 WHEN (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ex1 - es[i].ex0) AS INT)
                            ELSE CAST(SIGN(es[i].ex0 - es[i].ex1) AS INT) END) = -dy
                  AND (CASE WHEN es[i].ex0 = cx AND es[i].ey0 = cy
                            THEN CAST(SIGN(es[i].ey1 - es[i].ey0) AS INT)
                            ELSE CAST(SIGN(es[i].ey0 - es[i].ey1) AS INT) END) = dx
                 THEN 2
                 ELSE 3 END) * 1000 + i)) % 1000
      END AS pick
    FROM walk
    WHERE len(used) < len(es)) s)
SELECT rkey, CAST(ring AS INT) AS ring, CAST(vi AS INT) AS vi,
  vx AS x, vy AS y
FROM walk WHERE vx IS NOT NULL"""
    got = con.execute(walk_sql).fetchall()
    exp_s = sorted(expected)
    got_s = sorted(got)
    if exp_s == got_s:
        print(f"MATCH: {len(got_s)} vertex rows, "
              f"{len(set((r, g) for r, g, _, _, _ in got_s))} rings")
        # show ring structure
        import collections
        rc = collections.Counter((r, g) for r, g, _, _, _ in got_s)
        for k in sorted(rc):
            print(f"  rkey={k[0]} ring={k[1]}: {rc[k]} vertices")
    else:
        print(f"MISMATCH: python {len(exp_s)} rows, duckdb {len(got_s)} rows")
        for a, b in zip(exp_s[:40], got_s[:40]):
            mark = "  " if a == b else "->"
            print(f"{mark} py={a}  db={b}")
        sys.exit(1)


if __name__ == "__main__":
    main()
