"""Utility tools, mirroring the reference's submods
(libgramtools/submods/README.md):

  * encode-prg     bracketed/numbered PRG string -> binary PRG
  * print-fm-index SA/BWT/suffix table dump of a PRG
  * combine-jvcfs  merge multiple jVCF JSONs into one
  * visualise-prg  graphviz dot of a PRG subgraph

Run via: python -m gramtools_tpu.tools <tool> [args].
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def encode_prg_tool(argv):
    parser = argparse.ArgumentParser(prog="encode-prg")
    parser.add_argument("prg_string", help="bracketed ('A[C,G]T') or numbered "
                        "('A5C6G6T') PRG string")
    parser.add_argument("-o", "--output", default="prg")
    parser.add_argument("--numbered", action="store_true",
                        help="input uses numbered notation")
    args = parser.parse_args(argv)
    from .prg.linearise import PrgString, encode_prg, prg_string_to_ints

    ints = (encode_prg(args.prg_string) if args.numbered
            else prg_string_to_ints(args.prg_string))
    PrgString(ints).write(args.output)
    print(f"wrote {len(ints)} ints to {args.output}")


def print_fm_index_tool(argv):
    parser = argparse.ArgumentParser(prog="print-fm-index")
    parser.add_argument("prg_string", help="bracketed PRG string or path to "
                        "binary PRG (with --binary)")
    parser.add_argument("--binary", action="store_true")
    args = parser.parse_args(argv)
    from .index.fm import FMIndex
    from .prg.linearise import PrgString, prg_string_to_ints

    if args.binary:
        ints = PrgString.from_file(args.prg_string).ints
    else:
        ints = prg_string_to_ints(args.prg_string)
    fm = FMIndex.build(ints)
    text = np.concatenate([ints.astype(np.int64), [0]])
    print("i\tBWT\tSA\ttext_suffix")
    for i in range(fm.size):
        sa = int(fm.sa[i])
        suffix = " ".join(str(int(v)) for v in text[sa : sa + 20])
        print(f"{i}\t{int(fm.bwt[i])}\t{sa}\t{suffix}")


def combine_jvcfs_tool(argv):
    parser = argparse.ArgumentParser(prog="combine-jvcfs")
    parser.add_argument("jvcfs", nargs="+", help="jVCF JSON files to merge")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args(argv)
    from .infer.json_prg import combine_json_prgs

    with open(args.jvcfs[0]) as fh:
        combined = json.load(fh)
    for path in args.jvcfs[1:]:
        with open(path) as fh:
            combined = combine_json_prgs(combined, json.load(fh))
    with open(args.output, "w") as fh:
        json.dump(combined, fh, separators=(",", ":"))
        fh.write("\n")
    print(f"combined {len(args.jvcfs)} jVCFs -> {args.output}")


def visualise_prg_tool(argv):
    parser = argparse.ArgumentParser(prog="visualise-prg")
    parser.add_argument("prg_file", help="binary PRG file")
    parser.add_argument("-o", "--output", default="prg.dot")
    parser.add_argument("--start_node", type=int, default=0)
    parser.add_argument("--num_nodes", type=int, default=50)
    args = parser.parse_args(argv)
    from .prg.graph import build_cov_graph
    from .prg.linearise import PrgString

    g = build_cov_graph(PrgString.from_file(args.prg_file))
    lines = ["digraph prg {", "  rankdir=LR;"]
    lo = args.start_node
    hi = min(len(g.nodes), lo + args.num_nodes)
    shown = set(range(lo, hi))
    for i in shown:
        node = g.nodes[i]
        label = node.seq_str() or ("site_%d" % node.site_id if node.site_id
                                   else "·")
        shape = "box" if node.is_boundary else "ellipse"
        lines.append(f'  n{i} [label="{label}", shape={shape}];')
        for e in node.edges:
            if e in shown:
                lines.append(f"  n{i} -> n{e};")
    lines.append("}")
    with open(args.output, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.output}")


TOOLS = {
    "encode-prg": encode_prg_tool,
    "print-fm-index": print_fm_index_tool,
    "combine-jvcfs": combine_jvcfs_tool,
    "visualise-prg": visualise_prg_tool,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in TOOLS:
        print(f"usage: python -m gramtools_tpu.tools {{{'|'.join(TOOLS)}}} ...",
              file=sys.stderr)
        sys.exit(1)
    TOOLS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
