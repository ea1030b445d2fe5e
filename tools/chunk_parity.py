#!/usr/bin/env python3
"""Chunker parity fuzz: reference FixedSizeTextSplitter +
add_pymupdf_page_metadata (extracted at runtime) vs graft.expr.Chunker via
graft.tools.ChunkParity. BMP-only inputs — the engine chunks
post-normalization text, which has no non-BMP codepoints (SURVEY §7.4.2).

Usage: python3 tools/chunk_parity.py [n_cases]"""
import ast, json, random, re, sys

src = open("/root/reference/document_processor.py").read()
tree = ast.parse(src)

class Document:
    def __init__(self, page_content, metadata=None):
        self.page_content = page_content
        self.metadata = metadata or {}

class _Log:
    def warning(self, *a, **k): pass
    def info(self, *a, **k): pass

ns = {"re": re, "Document": Document, "logger": _Log(),
      "List": list, "Tuple": tuple, "Optional": None}
import typing
ns["List"] = typing.List; ns["Tuple"] = typing.Tuple; ns["Optional"] = typing.Optional
for node in tree.body:
    if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in (
            "FixedSizeTextSplitter", "add_pymupdf_page_metadata"):
        exec(compile(ast.Module(body=[node], type_ignores=[]), "ref", "exec"), ns)

FixedSizeTextSplitter = ns["FixedSizeTextSplitter"]
add_pymupdf = ns["add_pymupdf_page_metadata"]

WORDS = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "   ", " "]

def gen(rnd, with_markers):
    parts = []
    for _ in range(rnd.randint(0, 40)):
        if with_markers and rnd.random() < 0.15:
            parts.append(f"[[page{rnd.randint(1, 9)}]]")
        parts.append(rnd.choice(WORDS))
    return "".join(parts)

def ref_chunks(text, size, overlap):
    if "[[page" in text:
        docs = add_pymupdf(Document(text), chunk_size=size, chunk_overlap=overlap)
        return [[d.page_content, d.metadata.get("page_number")] for d in docs]
    docs = FixedSizeTextSplitter(size, overlap).split_documents([Document(text)])
    return [[d.page_content, None] for d in docs]

def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    rnd = random.Random(7)
    cases = []
    for i in range(n):
        text = gen(rnd, with_markers=(i % 3 == 0))
        size = rnd.randint(1, 40)
        overlap = rnd.randint(0, size)  # includes degenerate overlap == size
        cases.append({"text": text, "size": size, "overlap": overlap})
    json.dump(cases, open("/tmp/chunk_cases.json", "w"))

    try:
        results = json.load(open("/tmp/chunk_results.json"))
    except FileNotFoundError:
        print("run: sbt 'runMain graft.tools.ChunkParity /tmp/chunk_cases.json /tmp/chunk_results.json'")
        return 2
    bad = 0
    for i, (c, r) in enumerate(zip(cases, results)):
        # reference add_pymupdf with overlap >= size loops forever; our
        # engine guards with step=max(1); skip that comparison branch
        if "[[page" in c["text"] and c["overlap"] >= c["size"]:
            continue
        e = ref_chunks(c["text"], c["size"], c["overlap"])
        if e != r:
            bad += 1
            if bad <= 5:
                print(f"MISMATCH case {i}: {c}\n  py ={e}\n  jvm={r}")
    print(f"{len(cases)} cases: {'ALL MATCH' if bad == 0 else f'{bad} MISMATCHES'}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
