#!/usr/bin/env python3
"""One-shot refactor: split the 6.8k-line SparkEntry.scala into per-pack
files under src/main/scala/graft/entry/ (r4 verdict #4). Each pack holds a
contiguous (file-order) slice of the queries map plus the SAME queries'
oracle SQL; shared private helpers move to graft.entry.Q. SparkEntry keeps
entry() and composes the packs. Run once from the repo root."""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")

q_open = find(lambda l: l.startswith("  def queries:"))
q_close = find(lambda l: l == "  )", q_open)
o_open = find(lambda l: l.startswith("  def oracleSql:"))
o_close = find(lambda l: l == "  )", o_open)
obj_open = find(lambda l: l.startswith("object SparkEntry {"))
entry_def = find(lambda l: l.startswith("  def entry("))
last_brace = len(lines) - 1
while lines[last_brace].strip() != "}":
    last_brace -= 1

imports = lines[:obj_open]          # package + imports + scaladoc
top_helpers = lines[obj_open + 1:entry_def]   # t, dec2, sumd (+ blank lines)
# strip the scaladoc that belongs to entry() out of top_helpers tail
while top_helpers and (top_helpers[-1].strip().startswith("*") or
                       top_helpers[-1].strip().startswith("/**") or
                       top_helpers[-1].strip() == ""):
    top_helpers.pop()
entry_doc_and_def = lines[entry_def - 3:q_open]  # scaladoc + def entry + banner
mid_helpers = lines[q_close + 1:o_open]
tail_helpers = lines[o_close + 1:last_brace]

ENTRY_RE = re.compile(r'^    "(q[0-9a-zA-Z_]+)" ->')

def parse_entries(body):
    """body = lines strictly inside the Map( ... ) literal. Returns list of
    (name, block_lines) where leading comment runs attach to the entry."""
    entries, cur_name, cur = [], None, []
    pending_comments = []
    for ln in body:
        m = ENTRY_RE.match(ln)
        if m:
            if cur_name:
                entries.append((cur_name, cur))
            cur_name = m.group(1)
            cur = pending_comments + [ln]
            pending_comments = []
        elif cur_name is None or (ln.startswith("    //") and not cur):
            pending_comments.append(ln)
        elif ln.startswith("    //") and cur and cur[-1].rstrip().endswith((",",)):
            # comment between entries -> belongs to the next entry
            pending_comments.append(ln)
        else:
            if pending_comments:
                cur.extend(pending_comments)
                pending_comments = []
            cur.append(ln)
    if cur_name:
        cur.extend(pending_comments)
        entries.append((cur_name, cur))
    return entries

q_entries = parse_entries(lines[q_open + 1:q_close])
o_entries = parse_entries(lines[o_open + 1:o_close])
assert len(q_entries) == 215, len(q_entries)
assert len(o_entries) <= 215
o_map = dict(o_entries)
o_order = [n for n, _ in o_entries]

def strip_trailing_comma(block):
    blk = list(block)
    for i in range(len(blk) - 1, -1, -1):
        s = blk[i].rstrip()
        if s.endswith(","):
            blk[i] = s[:-1]
            return blk
        if s and not s.lstrip().startswith("//"):
            return blk
    return blk

def ensure_trailing_comma(block):
    blk = list(block)
    for i in range(len(blk) - 1, -1, -1):
        s = blk[i].rstrip()
        if s and not s.lstrip().startswith("//"):
            if not s.endswith(","):
                blk[i] = s + ","
            return blk
    return blk

# pack assignment: contiguous slices balanced on query+oracle line counts
def cost(name, qblk):
    return len(qblk) + len(o_map.get(name, []))

total = sum(cost(n, b) for n, b in q_entries)
NPACKS = 5
target = total / NPACKS
packs, cur, acc = [], [], 0.0
for n, b in q_entries:
    c = cost(n, b)
    if cur and acc + c / 2 > target and len(packs) < NPACKS - 1:
        packs.append(cur)
        cur, acc = [], 0.0
    cur.append((n, b))
    acc += c
packs.append(cur)
assert sum(len(p) for p in packs) == 215

PACK_DOC = [
    "relational core, KG taggers, curation/dedup, KG pipeline",
    "cross-validation, similarity/ANN, graph analytics (first band)",
    "graph analytics (second band), SPARQL/inference, ER",
    "centrality, sketches, temporal algebra, retrieval",
    "curation continuation, ER audits, late additions",
]

def pack_header(i):
    return (
        "package graft.entry\n\n"
        + "\n".join(l for l in imports if l.startswith("import")) + "\n\n"
        + "/** Driver-contract query pack %d/%d — %s.\n" % (i + 1, NPACKS, PACK_DOC[i])
        + "  * Split from the former 6.8k-line SparkEntry (r4 verdict #4);\n"
        + "  * content is byte-moved, composed back in [[graft.SparkEntry]].\n"
        + "  * Shared helpers live in [[graft.entry.Q]]. */\n"
        + "private[graft] object Pack%d {\n" % (i + 1)
        + "  import Q._\n\n"
    )

names_by_pack = []
for i, p in enumerate(packs):
    names = [n for n, _ in p]
    names_by_pack.append(names)
    out = [pack_header(i)]
    out.append("  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n")
    for j, (n, blk) in enumerate(p):
        blk = ensure_trailing_comma(blk) if j < len(p) - 1 else strip_trailing_comma(blk)
        out.append("\n".join(blk) + "\n")
    out.append("  )\n\n")
    onames = [n for n in o_order if n in set(names)]
    out.append("  def oracleSql: Map[String, String] = Map(\n")
    for j, n in enumerate(onames):
        blk = o_map[n]
        blk = ensure_trailing_comma(blk) if j < len(onames) - 1 else strip_trailing_comma(blk)
        out.append("\n".join(blk) + "\n")
    out.append("  )\n}\n")
    open(f"src/main/scala/graft/entry/Pack{i+1}.scala", "w").write("".join(out))

# shared helpers object
def unprivate(ls):
    return [re.sub(r"^(\s*)private (def|val|lazy val) ", r"\1\2 ", l) for l in ls]

q_out = [
    "package graft.entry\n\n"
    + "\n".join(l for l in imports if l.startswith("import")) + "\n\n"
    + "/** Shared helpers for the driver-contract query packs (moved verbatim\n"
    + "  * from SparkEntry when it was split — r4 verdict #4). */\n"
    + "private[graft] object Q {\n"
]
q_out.append("\n".join(unprivate(top_helpers)) + "\n")
q_out.append("\n".join(unprivate(mid_helpers)) + "\n")
q_out.append("\n".join(unprivate(tail_helpers)) + "\n}\n")
open("src/main/scala/graft/entry/Q.scala", "w").write("".join(q_out))

# new slim SparkEntry
se = []
se.extend(imports)
se.append("object SparkEntry {")
se.extend(entry_doc_and_def[:-3] if entry_doc_and_def[-3:] == ["  // " + "=" * 70] * 0 else entry_doc_and_def)
se.append("  def queries: Map[String, (SparkSession, String) => DataFrame] =")
se.append("    " + " ++ ".join(f"graft.entry.Pack{i+1}.queries" for i in range(NPACKS)))
se.append("")
se.append("  def oracleSql: Map[String, String] =")
se.append("    " + " ++ ".join(f"graft.entry.Pack{i+1}.oracleSql" for i in range(NPACKS)))
se.append("}")
open(SRC, "w").write("\n".join(se) + "\n")

for i, names in enumerate(names_by_pack):
    print(f"Pack{i+1}: {len(names)} queries [{names[0]} .. {names[-1]}]")
print("done")
