#!/usr/bin/env python3
"""Regenerate the generated section of DsOfficial.scala from ds_harness.py.

The DuckDB-first authoring flow: add/edit PREFIX and Q[...] in
tools/ds_harness.py, validate at all three SFs in DuckDB, then run this
script to rewrite everything below the GENERATED marker in
src/main/scala/graft/queries/DsOfficial.scala — entry names are
q{248+index}_{key} in Q-insertion order, so appended queries get the next
free entry number. DsHarnessSyncSuite enforces the result matches.

Run from the repo root: python3 tools/gen_dsofficial.py
"""
import re

H = 'tools/ds_harness.py'
S = 'src/main/scala/graft/queries/DsOfficial.scala'
MARKER = ('  // === GENERATED from tools/ds_harness.py by '
          'tools/gen_dsofficial.py — edit the harness, then regenerate ===\n')

src = open(H).read()
prefix = re.search(r'\nPREFIX = """(.*?)"""', src, re.S).group(1)
pairs = re.findall(r"Q\['(\w+)'\] = \"\"\"(.*?)\"\"\"", src, re.S)
assert pairs, 'no Q entries found in the harness'

scala = open(S).read()
assert MARKER in scala, f'marker line missing from {S}'
head = scala.split(MARKER)[0]

out = [head, MARKER]
out.append('\n  private val Prefix: String =\n    """%s"""\n' % prefix)
out.append('''
  private def entry(name: String, bodySql: String): QE = {
    val q = Prefix + bodySql
    // Spark executes the unused-CTE-pruned text (analysis of all ~17 prefix
    // CTE definitions measured ~1.3 s/query regardless of SF); the oracle
    // keeps the full verbatim text, so every run proves the equivalence.
    QE(name, Some(q), (s, d) => { Tables.views(s, d); s.sql(CtePrune.prune(q)) })
  }
''')
names = []
for i, (key, body) in enumerate(pairs):
    qn = key.replace('ds_', '').upper()  # ds_q1 -> Q1
    names.append((f'q{248 + i}_{key}', qn))
    out.append('\n  private val %s: String =\n    """%s"""\n' % (qn, body))
out.append('\n  def entries: Seq[QE] = Seq(\n')
out.append(',\n'.join('    entry("%s", %s)' % (n, q) for n, q in names))
out.append(')\n')
out.append('''
  /** The shared star-schema derivation prefix (exposed for the
    * materialized-star bench, which writes each CTE once as parquet and
    * re-points the body-only texts at the materialization).
    */
  def prefixSql: String = Prefix

  /** entry name -> official body text (what follows the shared prefix). */
  def bodies: Seq[(String, String)] = Seq(
''')
out.append(',\n'.join('    "%s" -> %s' % (n, q) for n, q in names))
out.append(')\n}\n')
open(S, 'w').write(''.join(out))
print(f'wrote {S}: {len(pairs)} queries, entries {names[0][0]}..{names[-1][0]}')
