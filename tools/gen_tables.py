"""Generate htmlgraft/_tables.py from tools/dump_tables.mjs output.

Usage:  node tools/dump_tables.mjs | python tools/gen_tables.py > htmlgraft/_tables.py
"""

import json
import sys


def main() -> None:
    data = json.load(sys.stdin)
    dfa = data["dfa"]

    def ints(values):
        return "(" + ",".join(str(v) for v in values) + ")"

    out = []
    w = out.append
    w('"""Data tables extracted from the reference parser (alwinb/html-parser).')
    w("")
    w("GENERATED FILE - do not edit.  Regenerate with:")
    w("  node tools/dump_tables.mjs | python tools/gen_tables.py > htmlgraft/_tables.py")
    w("")
    w("Data provenance (read-only reference, public repo alwinb/html-parser):")
    w("  DFA tables:   /root/reference/lib/dfa.js:22-39 (eqClass), 128-206 (table)")
    w("  class ids:    /root/reference/lib/schema.js:26-94")
    w("  bitvectors:   /root/reference/lib/schema.js:106-351")
    w("  rules:        /root/reference/lib/schema.js:399-741 (compiled Rule objects)")
    w("  rule maps:    /root/reference/lib/schema.js:751-955")
    w('"""')
    w("")
    w("# --- DFA ---")
    w(f"EQ_CLASS = {ints(dfa['eqClass'])}")
    w(f"DEFAULT_CLASS = {dfa['defaultClass']}")
    w(f"TABLE = {ints(dfa['table'])}")
    w(f"TABLE_WIDTH = {dfa['tableWidth']}")
    w(f"MIN_ACCEPTS = {dfa['minAccepts']}")
    w(f"INITIAL_STATE = {dfa['initialState']}")
    w(f"TOKENS = {json.dumps(dfa['tokens'])}")
    # states.PlainText aliases S.TOP in dfa.js but the reference tokeniser
    # overwrites it with undefined (tokeniser.js:22); we drop it so lookups
    # fall back to Main exactly like `contentMap[name] ?? S.Main` does.
    states = {k: v for k, v in dfa["states"].items() if k != "PlainText"}
    w(f"STATES = {json.dumps(states)}")
    w("")
    w("# --- element equivalence classes ---")
    w(f"CLASS_IDS = {json.dumps(data['classIds'])}")
    vectors = {k: int(v) for k, v in data["vectors"].items()}
    w("VECTORS = {")
    for k, v in vectors.items():
        w(f"    {k!r}: {v},")
    w("}")
    w("")
    w("# --- compiled rules (bitvectors as ints, may be negative = cofinite) ---")
    w("RULES_RAW = {")
    for name, r in data["rules"].items():
        fields = {
            "namespace": r["namespace"],
            "clearContext": int(r["clearContext"]),
            "closableAncestors": int(r["closableAncestors"]),
            "escalate": int(r["escalate"]),
            "content": int(r["content"]),
            "trap": int(r["trap"]),
            "pathsFor": int(r["pathsFor"]),
            "paths": r["paths"],
            "siblingRules": r["siblingRules"],
            "allowAutoClose": r["allowAutoClose"],
        }
        w(f"    {name!r}: {fields!r},")
    w("}")
    w("")
    w("# --- name -> (classId, ruleName) maps per namespace ---")
    w("RULE_MAPS = {")
    for ns, m in data["ruleMaps"].items():
        w(f"    {ns!r}: {{")
        for name, (cid, rule) in m.items():
            w(f"        {name!r}: ({cid}, {rule!r}),")
        w("    },")
    w("}")
    w("")
    sys.stdout.write("\n".join(out))


if __name__ == "__main__":
    main()
