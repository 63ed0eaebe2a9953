// Extracts the reference parser's *data tables* (DFA transition tables and the
// element-class / rule schema) by importing the reference library under Node
// and serialising the compiled data to JSON on stdout.
//
// The emitted JSON is turned into htmlgraft/_tables.py by tools/gen_tables.py.
// Only declarative data is extracted here; every algorithm (tokeniser loops,
// tree-construction, rule dispatch) is implemented independently in Python.
//
// Sources of the data (read-only reference):
//   /root/reference/lib/dfa.js     - eqClass, transition table, token/state ids
//   /root/reference/lib/schema.js  - class ids, bitvector combos, compiled rules,
//                                    name->(classId, rule) maps per namespace

import DFA from '/root/reference/lib/dfa.js'
import * as schema from '/root/reference/lib/schema.js'

const { classIds, C, Rules, breakoutRules, htmlRules, svgRules, mathRules } = schema

// phrasingRules is not exported by the reference; it is htmlRules with the
// five overrides applied at /root/reference/lib/schema.js:923-930.
const phrasingRules = Object.assign({}, htmlRules, {
  option:     [classIds.option,   Rules.optionInPhrasing],
  optgroup:   [classIds.optgroup, Rules.optgroupInPhrasing],
  a:          [classIds.a,        Rules.otherInPhrasing],
  noscript:   [classIds.noscript, Rules.otherInPhrasing],
  '#default': [classIds.OtherHtml, Rules.otherInPhrasing],
})

const big = (v) => typeof v === 'bigint' ? v.toString() : v

function dumpRule (r) {
  return {
    name: r.name,
    namespace: r.namespace,
    clearContext: big(r.clearContext),
    closableAncestors: big(r.closableAncestors),
    escalate: big(r.escalate),
    content: big(r.content),
    trap: big(r.trap),
    pathsFor: big(r.pathsFor),
    paths: r.paths,
    siblingRules: r.siblingRules,
    allowAutoClose: r.allowAutoClose,
  }
}

function dumpRuleMap (m) {
  const out = {}
  for (const k of Object.keys(m)) out[k] = [m[k][0], m[k][1].name]
  return out
}

const out = {
  dfa: {
    eqClass: Array.from(DFA.eqClass),
    defaultClass: DFA.defaultClass,
    table: Array.from(DFA.table),
    tableWidth: DFA.tableWidth,
    minAccepts: DFA.minAccepts,
    initialState: DFA.initialState,
    tokens: DFA.tokens,
    states: DFA.states, // NB states.PlainText is S.TOP per dfa.js:104 but the
                        // tokeniser overwrites S.PlainText with undefined
                        // (tokeniser.js:22 reads S.TOP which does not exist),
                        // so <plaintext> effectively tokenises as Main.
  },
  classIds,
  vectors: Object.fromEntries(Object.entries(C).map(([k, v]) => [k, big(v)])),
  rules: Object.fromEntries(Object.entries(Rules).map(([k, v]) => [k, dumpRule(v)])),
  ruleMaps: {
    breakout: dumpRuleMap(breakoutRules),
    html: dumpRuleMap(htmlRules),
    phrasing: dumpRuleMap(phrasingRules),
    math: dumpRuleMap(mathRules),
    svg: dumpRuleMap(svgRules),
  },
}

process.stdout.write(JSON.stringify(out))
