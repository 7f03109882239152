#!/usr/bin/env python3
"""Hermetic stand-in for minimap2/strobealign/bwa used by the e2e tests.

Maps reads by exact forward substring search against the reference FASTA
and emits SAM on stdout — enough to exercise the real pipeline
(invocation building, SAM consumption, in-engine sort, caching) without
the actual mapper binaries, which are not part of the test image.

Conventions understood:
  --version        print a version string satisfying every min-version gate
  read names ending in "_nmK" are emitted with NM:i:K (AS = len-K)
  reads that do not exact-match any contig are emitted as unmapped
"""

import os
import sys


def read_fastx(path):
    reads = []
    with open(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == ">":
            name, seq = None, []
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if name is not None:
                        reads.append((name, "".join(seq)))
                    name, seq = line[1:].split()[0], []
                else:
                    seq.append(line)
            if name is not None:
                reads.append((name, "".join(seq)))
        else:
            lines = [l.strip() for l in f]
            for i in range(0, len(lines) - 3, 4):
                reads.append((lines[i][1:].split()[0], lines[i + 1]))
    return reads


def main():
    args = sys.argv[1:]
    if "--version" in args:
        print("2.26-r1175")
        return 0
    if "--create-index" in args:  # strobealign index build: write a stub
        ref = [a for a in args if os.path.isfile(a)][-1]
        open(ref + ".r100.sti", "wb").close()
        return 0
    if "-d" in args:  # minimap2 index build: copy the FASTA as the "index"
        out = args[args.index("-d") + 1]
        ref = [a for a in args if os.path.isfile(a) and a != out][-1]
        with open(ref, "rb") as fi, open(out, "wb") as fo:
            fo.write(fi.read())
        return 0

    files = [a for a in args if os.path.isfile(a)]
    ref_path, read_paths = files[0], files[1:]

    contigs = []
    name, seq = None, []
    with open(ref_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    contigs.append((name, "".join(seq)))
                name, seq = line[1:].split()[0], []
            else:
                seq.append(line)
    if name is not None:
        contigs.append((name, "".join(seq)))

    if "--aemb" in args:
        # strobealign --aemb: per-contig mean coverage as 2-column TSV
        depth = {cname: 0 for cname, _ in contigs}
        for rp in read_paths:
            for _qname, seq in read_fastx(rp):
                for cname, cseq in contigs:
                    if cseq.find(seq) >= 0:
                        depth[cname] += len(seq)
                        break
        for cname, cseq in contigs:
            sys.stdout.write(f"{cname}\t{depth[cname] / len(cseq):.6f}\n")
        return 0

    out = sys.stdout
    out.write("@HD\tVN:1.6\tSO:unsorted\n")
    for cname, cseq in contigs:
        out.write(f"@SQ\tSN:{cname}\tLN:{len(cseq)}\n")
    out.write("@PG\tID:fake_mapper\tPN:fake_mapper\n")

    def locate(seq):
        for tid, (cname, cseq) in enumerate(contigs):
            i = cseq.find(seq)
            if i >= 0:
                return cname, i
        return None, -1

    def nm_of(qname, L):
        if "_nm" in qname:
            try:
                return int(qname.rsplit("_nm", 1)[1])
            except ValueError:
                pass
        return 0

    def emit(qname, flag, rname, pos, cigar, rnext, pnext, seq, nm):
        if rname is None:
            out.write(f"{qname}\t{flag | 0x4}\t*\t0\t0\t*\t*\t0\t0\t{seq}\t*\n")
        else:
            L = len(seq)
            out.write(
                f"{qname}\t{flag}\t{rname}\t{pos + 1}\t60\t{cigar}\t{rnext}\t"
                f"{pnext + 1}\t0\t{seq}\t*\tNM:i:{nm}\tAS:i:{L - nm}\n")

    if len(read_paths) == 2:
        r1 = read_fastx(read_paths[0])
        r2 = read_fastx(read_paths[1])
        for (n1, s1), (n2, s2) in zip(r1, r2):
            c1, p1 = locate(s1)
            c2, p2 = locate(s2)
            if c1 is not None and c2 is not None:
                emit(n1, 0x1 | 0x2 | 0x40, c1, p1, f"{len(s1)}M",
                     "=" if c1 == c2 else c2, p2, s1, nm_of(n1, len(s1)))
                emit(n2, 0x1 | 0x2 | 0x80, c2, p2, f"{len(s2)}M",
                     "=" if c1 == c2 else c1, p1, s2, nm_of(n2, len(s2)))
            elif c1 is not None:
                emit(n1, 0x1 | 0x8 | 0x40, c1, p1, f"{len(s1)}M", "=", p1,
                     s1, nm_of(n1, len(s1)))
                emit(n2, 0x1 | 0x4 | 0x80, None, 0, "*", "*", 0, s2, 0)
            elif c2 is not None:
                emit(n1, 0x1 | 0x4 | 0x40, None, 0, "*", "*", 0, s1, 0)
                emit(n2, 0x1 | 0x8 | 0x80, c2, p2, f"{len(s2)}M", "=", p2,
                     s2, nm_of(n2, len(s2)))
            else:
                emit(n1, 0x1 | 0x4 | 0x8 | 0x40, None, 0, "*", "*", 0, s1, 0)
                emit(n2, 0x1 | 0x4 | 0x8 | 0x80, None, 0, "*", "*", 0, s2, 0)
    else:
        for path in read_paths:
            for qname, seq in read_fastx(path):
                cname, p = locate(seq)
                if cname is None:
                    emit(qname, 4, None, 0, "*", "*", 0, seq, 0)
                else:
                    emit(qname, 0, cname, p, f"{len(seq)}M", "*", 0, seq,
                         nm_of(qname, len(seq)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
