"""Batch-convert every .ply in a directory to .glb
(ref: scripts/convert_all.py)."""
import glob
import os
import sys

from lgm_tpu import convert

if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "."
    for ply in sorted(glob.glob(os.path.join(d, "*.ply"))):
        print(f"=== {ply}")
        convert.main(["big", "--test-path", ply])
