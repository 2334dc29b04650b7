#!/usr/bin/env python3
"""Single-node reference-equivalent NVD feed ETL timing.

Mirrors bq_nvd/etl.py extract (gzip + json.loads, etl.py:19-49) and
transform (iterate CVE_Items, per-CVE scrub/keep decision, newline-JSON
dump, etl.py:51-116) with deltas off — the pure single-node data path of
the reference, minus its GCS/BQ network calls. Run on the same feed file
graft.BaselineCompare ingests.

Usage: python3 tools/baseline_nvd.py /tmp/nvd_big/nvdcve-1.1-big.json.gz
"""
import gzip, json, sys, time


def main(path):
    t0 = time.time()
    with gzip.open(path, "rb") as f:          # etl.py:35 extract
        nvd_dict = json.loads(f.read().decode("utf-8"))
    t_extract = time.time() - t0

    t1 = time.time()
    cve_list = nvd_dict["CVE_Items"]          # etl.py:77 transform
    scrubbed = []
    seen = set()                               # stand-in for get_cve_ids set
    for cve in cve_list:                       # etl.py:83-88 membership loop
        cid = cve["cve"]["CVE_data_meta"]["ID"]
        if cid not in seen:
            scrubbed.append(cve)
    out = path.replace(".json.gz", "_newline.json")
    with open(out, "w") as f:                  # etl.py:108-110 ndjson dump
        for cve in scrubbed:
            f.write(json.dumps(cve, indent=None, separators=(",", ":")) + "\n")
    t_transform = time.time() - t1

    print(f"REF_TIMING extract {t_extract:.2f}")
    print(f"REF_TIMING transform_dump {t_transform:.2f}")
    print(f"REF_TIMING total {t_extract + t_transform:.2f}")
    print(f"rows={len(scrubbed)}")


if __name__ == "__main__":
    main(sys.argv[1])
