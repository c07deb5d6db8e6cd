#!/usr/bin/env python3
"""check_oracle.py over only the keys that HAVE a Verify dump dir —
for fast local iteration on a key subset (Verify's 3rd arg). The full
gate stays tools/check_oracle.py.

Operates on a temp copy of the dump dir's metadata: the original
oracle_sql.json / keys.json are left intact so a later full-gate run of
tools/check_oracle.py against the same dir still validates everything
(r15 ADVICE: the in-place rewrite silently shrank the full gate)."""
import glob, json, os, shutil, sys, tempfile
sys.path.insert(0, os.path.dirname(__file__))
import check_oracle

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    present = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    subset = {k: v for k, v in oracle.items() if k in present}
    tmp = tempfile.mkdtemp(prefix="graft-subset-")
    try:
        # symlink each present key's dump dir; write subset metadata files
        for k in subset:
            os.symlink(os.path.abspath(f"{out_dir}/{k}"), f"{tmp}/{k}")
        json.dump(subset, open(f"{tmp}/oracle_sql.json", "w"))
        kj = f"{out_dir}/keys.json"
        if os.path.exists(kj):
            keys = [k for k in json.load(open(kj)) if k in present]
            json.dump(keys, open(f"{tmp}/keys.json", "w"))
        return check_oracle.main(sf_dir, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
