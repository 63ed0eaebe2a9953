// Reference-parser throughput harness: reads {url, html} JSONL (export a
// sample from the benchmark corpus first) and times parse / parse+printTree
// under Node for the match-or-beat comparison in BENCH/BASELINE.md.
//   node tools/bench_reference.mjs /dev/shm/pages_sample.jsonl
import { readFileSync } from 'fs'
import { parse } from '/root/reference/lib/index.js'
import { printTree } from '/root/reference/lib/traversal.js'

const file = process.argv[2] || '/dev/shm/pages_sample.jsonl'
const pages = readFileSync(file, 'utf8').split('\n').filter(x => x).map(l => JSON.parse(l))
let bytes = 0
for (const p of pages) bytes += p.html.length
for (let i = 0; i < Math.min(200, pages.length); i++) parse(pages[i].html)  // warm
for (const withPrint of [false, true]) {
  const t0 = process.hrtime.bigint()
  for (const p of pages) { const d = parse(p.html); if (withPrint) printTree(d) }
  const dt = Number(process.hrtime.bigint() - t0) / 1e9
  console.log(`reference ${withPrint ? 'parse+printTree' : 'parse-only'}: ` +
    `${(pages.length / dt).toFixed(0)} docs/s, ${(bytes / 1e6 / dt).toFixed(1)} MB/s`)
}
