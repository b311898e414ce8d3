#!/usr/bin/env python3
"""Class histogram (count + shallow bytes) from an HPROF heap dump.

Offline analog of `jmap -histo` for the `-XX:+HeapDumpOnOutOfMemoryError`
dumps the scale harness captures (SCALE.md, one-JVM sweep OOM
investigation): streams the binary hprof (JDK "JAVA PROFILE 1.0.2"
format), folds INSTANCE/OBJECT_ARRAY/PRIMITIVE_ARRAY dump sub-records
into per-class totals, and prints the top classes by shallow size. No
dominator tree — the goal is to NAME the whale (a retained Spark/graft
structure vs. transient execution-memory pages), not to graph it.

Usage: python3 tools/hprof_histo.py /tmp/graft_oom.hprof [topN]
"""
import mmap
import struct
import sys
from collections import defaultdict

PRIM_SIZE = {4: 1, 5: 2, 6: 4, 7: 8, 8: 1, 9: 2, 10: 4, 11: 8}
PRIM_NAME = {4: "boolean[]", 5: "char[]", 6: "float[]", 7: "double[]",
             8: "byte[]", 9: "short[]", 10: "int[]", 11: "long[]"}


def main(path, top_n=40):
    f = open(path, "rb")
    buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    # header: NUL-terminated version string, u4 id size, u8 timestamp
    nul = buf.find(b"\0")
    idsz = struct.unpack_from(">I", buf, nul + 1)[0]
    pos = nul + 1 + 4 + 8
    idfmt = ">Q" if idsz == 8 else ">I"

    def rid(p):
        return struct.unpack_from(idfmt, buf, p)[0]

    strings = {}           # string id -> bytes
    class_name = {}        # class object id -> name
    inst_size = {}         # class object id -> instance byte size
    counts = defaultdict(int)
    bytes_ = defaultdict(int)
    end = len(buf)

    def parse_segment(p, seg_end):
        while p < seg_end:
            sub = buf[p]
            p += 1
            if sub == 0x20:  # CLASS_DUMP
                cls = rid(p)
                # class id, u4 stack serial, then super/loader/signers/
                # protection-domain/reserved1/reserved2 ids
                p += idsz + 4 + 6 * idsz
                isz = struct.unpack_from(">I", buf, p)[0]
                p += 4
                inst_size[cls] = isz
                (n_cp,) = struct.unpack_from(">H", buf, p)
                p += 2
                for _ in range(n_cp):
                    t = buf[p + 2]
                    p += 3 + (idsz if t == 2 else PRIM_SIZE[t])
                (n_st,) = struct.unpack_from(">H", buf, p)
                p += 2
                for _ in range(n_st):
                    t = buf[p + idsz]
                    p += idsz + 1 + (idsz if t == 2 else PRIM_SIZE[t])
                (n_if,) = struct.unpack_from(">H", buf, p)
                p += 2 + n_if * (idsz + 1)
            elif sub == 0x21:  # INSTANCE_DUMP
                cls = rid(p + idsz + 4)
                (nb,) = struct.unpack_from(">I", buf, p + 2 * idsz + 4)
                counts[cls] += 1
                bytes_[cls] += nb + 16
                p += idsz + 4 + idsz + 4 + nb
            elif sub == 0x22:  # OBJECT_ARRAY_DUMP
                (n,) = struct.unpack_from(">I", buf, p + idsz + 4)
                cls = rid(p + idsz + 8)
                counts[cls] += 1
                bytes_[cls] += 24 + n * idsz
                p += idsz + 8 + idsz + n * idsz
            elif sub == 0x23:  # PRIMITIVE_ARRAY_DUMP
                (n,) = struct.unpack_from(">I", buf, p + idsz + 4)
                t = buf[p + idsz + 8]
                key = "prim:%d" % t
                counts[key] += 1
                bytes_[key] += 24 + n * PRIM_SIZE[t]
                p += idsz + 9 + n * PRIM_SIZE[t]
            elif sub in (0xFF, 0x05, 0x07):          # 1-id roots
                p += idsz
            elif sub == 0x01:                        # JNI_GLOBAL
                p += 2 * idsz
            elif sub in (0x02, 0x03, 0x08):          # id + 2 u4 roots
                p += idsz + 8
            elif sub in (0x04, 0x06):                # id + u4 roots
                p += idsz + 4
            else:
                raise ValueError("unknown heap sub-record 0x%02x @%d" % (sub, p))
        return p

    while pos < end:
        tag = buf[pos]
        (length,) = struct.unpack_from(">I", buf, pos + 5)
        body = pos + 9
        if tag == 0x01:      # UTF8
            strings[rid(body)] = buf[body + idsz:body + length]
        elif tag == 0x02:    # LOAD_CLASS
            cls = rid(body + 4)
            name_id = rid(body + 4 + idsz + 4)
            class_name[cls] = name_id
        elif tag in (0x0C, 0x1C):  # HEAP_DUMP / _SEGMENT
            parse_segment(body, body + length)
        pos = body + length

    def name_of(key):
        if isinstance(key, str):  # primitive array
            return PRIM_NAME[int(key.split(":")[1])]
        nid = class_name.get(key)
        raw = strings.get(nid, b"<unknown>").decode("utf-8", "replace")
        return raw.replace("/", ".")

    rows = sorted(bytes_.items(), key=lambda kv: kv[1], reverse=True)
    total_b = sum(bytes_.values())
    total_c = sum(counts.values())
    print("%12s %14s  %s" % ("count", "bytes", "class"))
    for key, b in rows[:top_n]:
        print("%12d %14d  %s" % (counts[key], b, name_of(key)))
    print("%12d %14d  TOTAL (%d classes)" % (total_c, total_b, len(bytes_)))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
