#!/usr/bin/env python3
"""Generate the JSONPath whole-grammar parity fixture.

Walks randomly generated JSON documents and emits grammar-consistent
paths (fields, quoted/dotted names, [*], indices, slices, index unions,
field unions, wildcard, recursive descent), then records what the REAL
jsonpath_ng base grammar — the exact library the reference delegates to
(reference backend.py:7,408-447) — matches for each. The committed
fixture (src/test/resources/jsonpath_parity.jsonl) is replayed offline
by RmlSpec "whole-grammar parity fixture", so sbt never needs Python.

Cases are filtered to the shared semantic core: >=1 match, all matches
scalar and non-null (the documented divergences — loud rejects on absent
fields / array roots, present-null vs absent-key ambiguity — are pinned
by dedicated unit tests instead). Deterministic via a fixed seed; rerun
only to regenerate after a deliberate grammar change:

    python3 scripts/gen_jsonpath_parity.py
"""
import json
import random
import re
import sys

from jsonpath_ng import parse

# exploration mode: gen_jsonpath_parity.py <seed> <out.jsonl> fuzzes a
# different seed into a scratch file (replay with scripts/replay_parity
# .scala); no args = regenerate the canonical committed fixture
SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 20260817
OUT = sys.argv[2] if len(sys.argv) > 2 else "src/test/resources/jsonpath_parity.jsonl"
# exploration-only knob: deeper documents + longer paths stress descent
# multi-targeting and branch navigation harder (canonical fixture stays
# at the defaults — never pass a depth when regenerating it)
DEPTH = int(sys.argv[3]) if len(sys.argv) > 3 else 3
STEPS = 4 if DEPTH <= 3 else 6
N_TARGET = 160
MAX_TRIES = 20000

rng = random.Random(SEED)

NAMES = ["a", "b", "cc", "a.b", "x_1", "name"]
IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def gen_scalar():
    if rng.random() < 0.5:
        return rng.randint(-99, 999)
    return rng.choice(["alpha", "beta", "g g", "z/9", "", "héllo"])


def gen_doc(depth):
    """An object node; values may be scalars, homogeneous arrays, or
    nested objects (arrays never mix scalars with objects — Spark's
    schema unification would degrade mixed arrays to strings)."""
    obj = {}
    for name in rng.sample(NAMES, rng.randint(2, 4)):
        r = rng.random()
        if depth <= 0 or r < 0.35:
            obj[name] = gen_scalar()
        elif r < 0.52:
            obj[name] = [gen_scalar() for _ in range(rng.randint(1, 6))]
        elif r < 0.62:
            # NESTED arrays (list-of-lists-of-objects): the shape whose
            # [n]/[*]/slice matches are themselves lists — a following
            # `..` must enter them (Descendants walks list elements)
            obj[name] = [[gen_doc(depth - 1)
                          for _ in range(rng.randint(1, 2))]
                         for _ in range(rng.randint(1, 3))]
        elif r < 0.82:
            obj[name] = [gen_doc(depth - 1) for _ in range(rng.randint(1, 4))]
        else:
            obj[name] = gen_doc(depth - 1)
    return obj


def field_access(name):
    if IDENT.match(name):
        return "." + name
    return "['" + name + "']"


def descent_token(name):
    return ".." + name if IDENT.match(name) else "..['" + name + "']"


def keys_below(node):
    """All dict keys anywhere at or below node (descent targets)."""
    ks = set()
    if isinstance(node, dict):
        ks |= set(node.keys())
        for v in node.values():
            ks |= keys_below(v)
    elif isinstance(node, list):
        for e in node:
            ks |= keys_below(e)
    return ks


def values_of_key(node, k):
    """Every value held under key k anywhere at or below node, in
    deterministic document order."""
    vals = []
    if isinstance(node, dict):
        for kk, v in node.items():
            if kk == k:
                vals.append(v)
            vals.extend(values_of_key(v, k))
    elif isinstance(node, list):
        for e in node:
            vals.extend(values_of_key(e, k))
    return vals


CONFLICT = object()


def shape(x):
    """Spark-JSON-inference shape: scalars unify freely (lexemes are
    preserved as strings), but scalar-vs-object, scalar-vs-array and
    array-vs-object conflicts degrade the field to a raw-JSON STRING
    column — invisible to the engine's schema-resolved navigation. Docs
    containing any such conflict are excluded from the parity fixture
    (documented engine boundary, not a bug)."""
    if isinstance(x, dict):
        return {k: shape(v) for k, v in x.items()}
    if isinstance(x, list):
        merged = "empty"
        for e in x:
            merged = merge(merged, shape(e))
        return ("list", merged)
    # scalar kinds matter too: Spark's inference treats "" as null-like,
    # so a column holding numbers AND empty strings infers numeric, fails
    # to parse the "" and nulls the whole field — poison, see has_conflict
    return ("scalar", frozenset(
        ["num" if isinstance(x, int) else ("estr" if x == "" else "str")]))


def merge(a, b):
    if a == "empty":
        return b
    if b == "empty":
        return a
    if a is CONFLICT or b is CONFLICT:
        return CONFLICT
    if isinstance(a, dict) and isinstance(b, dict):
        return {k: (merge(a[k], b[k]) if k in a and k in b
                    else a.get(k, b.get(k))) for k in set(a) | set(b)}
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0] == "list":
        return ("list", merge(a[1], b[1]))
    if isinstance(a, tuple) and isinstance(b, tuple) and a[0] == b[0] == "scalar":
        return ("scalar", a[1] | b[1])
    return CONFLICT


def has_conflict(sh):
    if sh is CONFLICT:
        return True
    if isinstance(sh, dict):
        return any(has_conflict(v) for v in sh.values())
    if isinstance(sh, tuple) and sh[0] == "list":
        return has_conflict(sh[1])
    if isinstance(sh, tuple) and sh[0] == "scalar":
        return {"num", "estr"} <= sh[1]
    return False


def gen_path(doc):
    """Walk the document, emitting segments consistent with the node
    types, ending at a scalar. Returns the path string or None."""
    segs = []
    node = doc
    # occasionally start with a recursive descent to a field that exists
    # somewhere below
    steps = rng.randint(1, STEPS)
    for _ in range(steps):
        if isinstance(node, dict):
            if not node:
                return None
            keys = list(node.keys())
            r = rng.random()
            if r < 0.08 and all(
                    not isinstance(v, (dict, list)) for v in node.values()):
                segs.append(".*")  # homogeneous-scalar wildcard
                return "$" + "".join(segs)
            if r < 0.12 and len(node) >= 1 and all(
                    isinstance(v, dict) for v in node.values()):
                # homogeneous-OBJECT wildcard: members widen and union by
                # key; continue walking from one member to a scalar end
                segs.append(".*")
                node = node[rng.choice(keys)]
                continue
            if r < 0.2:
                scalar_keys = [k for k in keys
                               if not isinstance(node[k], (dict, list))]
                dict_keys = [k for k in keys if isinstance(node[k], dict)]
                if len(scalar_keys) >= 2:
                    pick = rng.sample(scalar_keys, 2)
                    segs.append("['" + "','".join(pick) + "']")
                    return "$" + "".join(segs)
                if len(dict_keys) >= 2:
                    pick = rng.sample(dict_keys, 2)
                    segs.append("['" + "','".join(pick) + "']")
                    node = node[rng.choice(pick)]
                    continue
                if dict_keys and scalar_keys:
                    # MIXED union (scalar + object member) with trailing
                    # navigation: jsonpath_ng navigates each member
                    # independently; the scalar member contributes no
                    # deeper match. Walk on from the object member.
                    d = rng.choice(dict_keys)
                    s = rng.choice(scalar_keys)
                    pick = [d, s] if rng.random() < 0.5 else [s, d]
                    segs.append("['" + "','".join(pick) + "']")
                    node = node[d]
                    continue
            if r < 0.26:
                # descent to a key reachable below (may multi-target)
                k = rng.choice(keys)
                segs.append(".." + k if IDENT.match(k) else "..['" + k + "']")
                node = node[k]
                continue
            k = rng.choice(keys)
            segs.append(field_access(k))
            node = node[k]
        elif isinstance(node, list):
            if not node:
                return None
            r = rng.random()
            if r < 0.12:
                # descent FROM a list match ($.a[0]..name and friends):
                # Descendants enters list elements, so a descent is valid
                # here whenever some key exists below; continue the walk
                # from one representative instance of that key
                ks = sorted(keys_below(node))
                if ks:
                    k = rng.choice(ks)
                    segs.append(descent_token(k))
                    node = rng.choice(values_of_key(node, k))
                    continue
            if r < 0.4:
                segs.append("[*]")
                node = rng.choice(node)
            elif r < 0.6:
                i = rng.randint(-len(node), len(node) - 1)
                segs.append(f"[{i}]")
                node = node[i]
            elif r < 0.75 and len(node) >= 2:
                i, j = (rng.randint(0, len(node) - 1) for _ in range(2))
                segs.append(f"[{i},{j}]")
                node = node[i]
            else:
                lo = rng.choice([None, rng.randint(-4, 4)])
                hi = rng.choice([None, rng.randint(-4, 4)])
                st = rng.choice([None, 2, 3])
                segs.append("[%s:%s%s]" % (
                    "" if lo is None else lo, "" if hi is None else hi,
                    "" if st is None else ":%d" % st))
                sl = node[slice(lo, hi, st)]
                if not sl:
                    return None
                node = rng.choice(sl)
        else:
            break
    if isinstance(node, (dict, list)):
        return None
    # strings CHAR-index in jsonpath_ng ($.s[0] on "hi" -> 'h'); emit one
    # sometimes when the string is still schema-typed (no descent in the
    # path — index-after-descent stays excluded, see main()). Cases where
    # a sibling branch would make jsonpath_ng crash are dropped by the
    # try/except in main(), so everything emitted is engine-safe.
    # ...but never on lexemes the engine treats as type-ambiguous (it
    # raises at runtime where a non-string reading would crash the
    # reference): leading -0-9{[ or exactly true/false/null
    if (isinstance(node, str) and node
            and not re.match(r"[-0-9{\[]", node)
            and node not in ("true", "false", "null")
            and not any(".." in s for s in segs) and rng.random() < 0.3):
        if rng.random() < 0.3:
            i, j = (rng.randint(-len(node), len(node) - 1) for _ in range(2))
            segs.append(f"[{i},{j}]")
        else:
            segs.append(f"[{rng.randint(-len(node), len(node) - 1)}]")
    return "$" + "".join(segs)


def indexes_on_all_list_descent_targets(doc, path):
    """True iff every numeric bracket group at/after the first descent
    sits directly on a `..target` whose every instance below `doc` is a
    list (the safe shape — see the caller's comment)."""
    first = path.find("..")
    for m in re.finditer(r"\[\s*-?\d+\s*[,\]]", path):
        if m.start() < first:
            continue
        dm = re.search(
            r"\.\.(?:\['([^']+)'\]|([A-Za-z_][A-Za-z0-9_]*))$",
            path[:m.start()])
        if not dm:
            return False
        k = dm.group(1) or dm.group(2)
        vals = values_of_key(doc, k)
        if not vals or not all(isinstance(v, list) for v in vals):
            return False
    return True


def main():
    out, seen = [], set()
    tries = 0
    while len(out) < N_TARGET and tries < MAX_TRIES:
        tries += 1
        doc = gen_doc(rng.randint(1, DEPTH))
        if has_conflict(shape(doc)):
            continue
        path = gen_path(doc)
        if path is None:
            continue
        key = (json.dumps(doc, sort_keys=True), path)
        if key in seen:
            continue
        # after a multi-target descent, later segments apply across
        # heterogeneous instances; numeric indexing a non-list there
        # CHAR-indexes strings / crashes in jsonpath_ng — the engine's
        # documented loud-reject boundary. One shape IS safe and stays
        # in scope: an index sitting DIRECTLY on a descent target whose
        # every instance below the doc is a list ($..x[0]...) — then
        # jsonpath_ng indexes real lists in every branch, same as the
        # engine. Everything else index-after-descent is excluded.
        head, _, tail = path.partition("..")
        if tail and re.search(r"\[\s*-?\d+\s*[,\]]", tail):
            if not indexes_on_all_list_descent_targets(doc, path):
                continue
        try:
            matches = [m.value for m in parse(path).find(doc)]
        except Exception:
            continue  # forms base jsonpath_ng rejects are out of scope
        if not matches:
            continue
        if any(m is None or isinstance(m, (dict, list, bool, float))
               for m in matches):
            continue  # shared scalar core only (see module doc)
        out.append({"doc": doc, "path": path,
                    "expected": sorted(str(m) for m in matches)})
        seen.add(key)
    assert len(out) == N_TARGET, f"only {len(out)} cases after {tries} tries"
    with open(OUT, "w") as f:
        for case in out:
            f.write(json.dumps(case, sort_keys=True) + "\n")
    kinds = {}
    for c in out:
        for k in ["..", "[*]", ":", ",", ".*", "['"]:
            if k in c["path"]:
                kinds[k] = kinds.get(k, 0) + 1
    print(f"wrote {len(out)} cases; construct counts: {kinds}")


if __name__ == "__main__":
    main()
