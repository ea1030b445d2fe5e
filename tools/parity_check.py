#!/usr/bin/env python3
"""Behavioral parity fuzz: run the reference's text normalizers (extracted
at runtime from /root/reference — never copied into the engine) against the
JVM TextNorm over adversarial unicode inputs, via graft.tools.NormParity.

Usage: python3 tools/parity_check.py [n_cases]
Writes cases to /tmp/norm_cases.json, expects the JVM side to have produced
/tmp/norm_results.json (see the sbt command it prints)."""
import ast, json, random, sys, unicodedata, re  # noqa: F401 (exec needs re)

def extract_fn(path, name):
    tree = ast.parse(open(path).read())
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            mod = ast.Module(body=[node], type_ignores=[])
            ns = {"unicodedata": unicodedata, "re": re}
            exec(compile(mod, path, "exec"), ns)
            return ns[name]
    raise SystemExit(f"{name} not found in {path}")

normalize_text = extract_fn("/root/reference/utilities_core.py", "normalize_text")
_normalize_text = extract_fn("/root/reference/embedding_models.py", "_normalize_text")

POOLS = [
    range(0x20, 0x7F),              # ascii
    range(0x00, 0x20),              # C0
    [0x7F], range(0x80, 0xA0),      # DEL + C1
    [0xAD, 0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0x2060, 0x2061, 0x2062,
     0x2063, 0x2064, 0xFEFF],       # invisibles
    [0xFFFD],
    range(0xE000, 0xE010),          # private use
    [0x1F600, 0x10400, 0x20000],    # non-BMP
    [0xFB01, 0xFF11, 0x2460, 0x00A0, 0x3000, 0x2007, 0x1680],  # NFKC-interesting
    [0x09, 0x0A, 0x0D, 0x20, 0x2028, 0x2029, 0x85],            # whitespace-ish
    range(0x3040, 0x30FF),          # kana
]

def gen(rnd):
    n = rnd.randint(0, 60)
    return "".join(chr(rnd.choice(list(rnd.choice(POOLS)))) for _ in range(n))

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rnd = random.Random(42)
    cases = [gen(rnd) for _ in range(n)]
    cases += ["", " ", "​", "a­b", "ﬁle\r\n１２３", "a\U0001F600b"]
    json.dump(cases, open("/tmp/norm_cases.json", "w"))

    expected = []
    for c in cases:
        expected.append({
            "idx": normalize_text(c, False),
            "idx_pw": normalize_text(c, True),
            "q": _normalize_text(c),
        })

    try:
        results = json.load(open("/tmp/norm_results.json"))
    except FileNotFoundError:
        print("run: sbt 'runMain graft.tools.NormParity /tmp/norm_cases.json /tmp/norm_results.json'")
        return 2
    assert len(results) == len(cases)
    bad = 0
    for i, (c, e, r) in enumerate(zip(cases, expected, results)):
        for k in ("idx", "idx_pw", "q"):
            if e[k] != r[k]:
                bad += 1
                if bad <= 10:
                    print(f"MISMATCH case {i} mode {k}: input={c!r}\n  py  ={e[k]!r}\n  jvm ={r[k]!r}")
    print(f"{len(cases)} cases x 3 modes: {'ALL MATCH' if bad == 0 else f'{bad} MISMATCHES'}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
