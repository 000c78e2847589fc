"""Command-line facade mirroring the reference REPL verbs
(README.md:25-56; REPL loop at file_server/fileserver.py:1234-1388).

    python -m distributed_mapreduce_spark --warehouse WH <verb> [args...]

Verbs:
    put <local_path> <name>          register a file as a named dataset
    get <name> <local_csv>           materialize a dataset to local CSV
    delete <name>                    drop a dataset
    ls <name>                        dataset metadata
    store                            list datasets
    filetable                        full metadata dump
    select <name> <regex>            SELECT ALL FROM name WHERE regex
    grep <path_glob> <regex> [a|c|m] distributed grep over log files
    maple <cmd> <n> <inter> <src>    map phase via executable (stdin
                                     lines -> "key\\tvalue" stdout lines)
    juice <cmd> <n> <src> <dest> <delete 0|1> <hash|range>
                                     reduce phase via executable

The maple/juice exe contract differs from the reference's
key-in-filename protocol (data/maple-exe.go:41): executables exchange
tab-separated key/value lines on stdin/stdout, which survives
distribution. Python-function pipelines use the library API
(distributed_mapreduce_spark.engine.Engine) directly.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="distributed_mapreduce_spark")
    ap.add_argument("--warehouse", default="./warehouse")
    ap.add_argument("--cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="verb", required=True)

    p = sub.add_parser("put")
    p.add_argument("local_path")
    p.add_argument("name")
    p = sub.add_parser("get")
    p.add_argument("name")
    p.add_argument("local_csv")
    p = sub.add_parser("delete")
    p.add_argument("name")
    p = sub.add_parser("ls")
    p.add_argument("name")
    sub.add_parser("store")
    sub.add_parser("filetable")
    p = sub.add_parser("select")
    p.add_argument("name")
    p.add_argument("regex")
    p = sub.add_parser("grep")
    p.add_argument("path_glob")
    p.add_argument("regex")
    p.add_argument("mode", nargs="?", default="a", choices=["a", "c", "m"])
    p = sub.add_parser("maple")
    p.add_argument("cmd")
    p.add_argument("num_maples", type=int)
    p.add_argument("intermediate")
    p.add_argument("src")
    p = sub.add_parser("juice")
    p.add_argument("cmd")
    p.add_argument("num_juices", type=int)
    p.add_argument("src")
    p.add_argument("dest")
    p.add_argument("delete_input", type=int, choices=[0, 1])
    p.add_argument("partition", choices=["hash", "range"])

    args = ap.parse_args(argv)

    from distributed_mapreduce_spark.engine import Engine
    from distributed_mapreduce_spark.maplejuice import juice_exe, maple_exe
    from distributed_mapreduce_spark.session import get_spark

    spark = get_spark("dmr-cli", cpus=args.cpus)
    eng = Engine(spark, args.warehouse)

    if args.verb == "put":
        eng.put(args.local_path, args.name)
        print(f"put {args.local_path} -> {args.name}")
    elif args.verb == "get":
        eng.catalog.get_to_local(args.name, args.local_csv)
        print(f"get {args.name} -> {args.local_csv}")
    elif args.verb == "delete":
        ok = eng.delete(args.name)
        print("deleted" if ok else "not found")
        return 0 if ok else 1
    elif args.verb == "ls":
        print(json.dumps(eng.ls(args.name)))
    elif args.verb == "store":
        for n in eng.store():
            print(n)
    elif args.verb == "filetable":
        print(json.dumps(eng.filetable(), indent=2))
    elif args.verb == "select":
        for row in eng.select(args.name, args.regex).collect():
            print(",".join("" if v is None else str(v) for v in row))
    elif args.verb == "grep":
        for row in eng.grep(args.path_glob, args.regex, args.mode).collect():
            print("\t".join(str(v) for v in row))
    elif args.verb == "maple":
        kv = maple_exe(eng.get(args.src), args.cmd, args.num_maples)
        eng.put(kv, args.intermediate)
        print(f"maple done -> {args.intermediate}")
    elif args.verb == "juice":
        out = juice_exe(eng.get(args.src), args.cmd, args.num_juices, args.partition)
        eng.put(out, args.dest)
        if args.delete_input:
            eng.delete(args.src)
        print(f"juice done -> {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
