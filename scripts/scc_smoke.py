"""Dev smoke: new coloring SCC vs closure oracle kernel on synthetic graphs."""
import random
import time

from pyspark.sql import SparkSession

from seccosql_spark.graph.algorithms import (
    strongly_connected_components,
    strongly_connected_components_closure,
)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def check(name, edge_list, closure_rounds=60):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    stats = {}
    t0 = time.time()
    got = {(r["id"], r["scc"]) for r in strongly_connected_components(e, stats=stats).collect()}
    t1 = time.time()
    want = {
        (r["id"], r["scc"])
        for r in strongly_connected_components_closure(e, max_rounds=closure_rounds).collect()
    }
    ok = got == want
    print(f"{name}: {'OK' if ok else 'MISMATCH'} n={len(want)} {t1-t0:.1f}s stats={stats}")
    if not ok:
        print("  got-want:", sorted(got - want)[:10])
        print("  want-got:", sorted(want - got)[:10])
    return ok


rng = random.Random(7)
all_ok = True

# two cycles joined one-way + a tail
cyc = [(i, (i + 1) % 10) for i in range(10)] + [(20 + i, 20 + (i + 1) % 8) for i in range(8)]
cyc += [(3, 21), (27, 40), (40, 41)]
all_ok &= check("two-cycles", cyc)

# forward chain (all singletons, increasing ids)
all_ok &= check("fwd-chain", [(i, i + 1) for i in range(30)])

# reverse chain (decreasing ids)
all_ok &= check("rev-chain", [(i + 1, i) for i in range(30)])

# random sparse digraph
n = 60
redges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
redges = [(a, b) for a, b in redges if a != b]
all_ok &= check("random-60", redges)

# self loops + isolated-ish nodes
all_ok &= check("selfloops", [(1, 1), (2, 3), (3, 2), (4, 5)])

# chain of 3 nontrivial SCCs (condensation depth 3), ids adversarial (max in head)
sccs = [[100, 1, 2], [50, 51, 52], [90, 10, 11]]
ed = []
for grp in sccs:
    for i in range(len(grp)):
        ed.append((grp[i], grp[(i + 1) % len(grp)]))
ed += [(1, 50), (51, 10)]
all_ok &= check("scc-chain", ed)

print("ALL OK" if all_ok else "FAILURES")
spark.stop()
