#!/usr/bin/env python3
"""check_oracle.py over only the keys that HAVE a Verify dump dir —
for fast local iteration on a key subset (Verify's 3rd arg). The full
gate stays tools/check_oracle.py."""
import glob, json, os, sys
sys.path.insert(0, os.path.dirname(__file__))
import check_oracle

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    present = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
    subset = {k: v for k, v in oracle.items() if k in present}
    json.dump(subset, open(f"{out_dir}/oracle_sql.json", "w"))
    kj = f"{out_dir}/keys.json"
    if os.path.exists(kj):
        keys = [k for k in json.load(open(kj)) if k in present]
        json.dump(keys, open(kj, "w"))
    return check_oracle.main(sf_dir, out_dir)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
