#!/bin/bash
# Capture plans/r06/<q>_after.txt for every query touched in the r6
# optimization round. Two passes per iterative query: the default plan
# (what the driver executes — local fast paths / checkpoint scans), and
# for the loop operators a "round-plan shape" excerpt with
# spark.graft.materialize=none and the local-path gates forced to 0, so
# the BEYOND-GATE distributed round shape (with the r6 broadcast hints)
# is visible to an auditor who cannot run Spark.
set -e
cd /root/repo
OUT=plans/r06
QUERIES_PLAIN="q127_blocking_eval q144_truth_discovery q165_coloring q173_winnow q175_greedy_cover q196_stable_match q198_freq_itemsets q199_assoc_rules q59_triangles q76_property_path q87_condensation_levels q96_setsim_join q197_containment q183_repeated_spans q80_repeated_passages q93_cooccurrence q102_cooccur_pmi q117_neg_sampling q63_bfs_distances q88_editdist_join"
QUERIES_LOOP="q114_harmonic q116_hits q56_pagerank q58_path_reachable q64_communities q68_kcore"

# pass 1: default conf — the executed plan
sbt -batch "runMain graft.tools.PlanDump $QUERIES_PLAIN $QUERIES_LOOP" \
  > /tmp/plandump_default.txt 2>/dev/null

# pass 2: full lineage, gates off — the distributed round shape
SPARK_GRAFT_EXTRA_CONF="spark.graft.materialize=none;spark.graft.kcore.localMaxEdges=0;spark.graft.coloring.localMaxEdges=0;spark.graft.stablematch.localMaxRows=0;spark.graft.coverage.localMaxRows=0;spark.graft.distances.localMaxEdges=0;spark.graft.topo.localMaxEdges=0" \
  sbt -batch "runMain graft.tools.PlanDump $QUERIES_LOOP" \
  > /tmp/plandump_none.txt 2>/dev/null

python3 - <<'PYEOF'
import re, os
def split_plans(path):
    txt = open(path).read()
    parts = re.split(r"\n========== (\S+) ==========\n", txt)
    out = {}
    for i in range(1, len(parts), 2):
        out[parts[i]] = parts[i+1].strip()
    return out

default = split_plans('/tmp/plandump_default.txt')
none = split_plans('/tmp/plandump_none.txt')
loops = set("q114_harmonic q116_hits q56_pagerank q58_path_reachable q64_communities q68_kcore".split())
os.makedirs('plans/r06', exist_ok=True)
for q, plan in default.items():
    body = plan
    if q in loops and q in none:
        lines = none[q].splitlines()
        excerpt = "\n".join(lines[:120])
        body += ("\n\n===== round-plan shape (spark.graft.materialize=none, "
                 "local gates=0, full lineage) =====\n"
                 "(truncated to first 120 lines — full-lineage plans of "
                 "iterative operators repeat the same per-round join shape)\n"
                 + excerpt)
    with open(f'plans/r06/{q}_after.txt', 'w') as f:
        f.write(body + "\n")
    print('wrote', q)
PYEOF
