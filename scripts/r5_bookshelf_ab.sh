#!/bin/bash
# Seeded A/B for the bookshelf fit-head fix (artifacts/bookshelf_mechanism.md):
# seed 4 (the floor seed: bookshelf AP 0.001) transfer variant with the
# phase-A anisotropic shape augmentation OFF vs ON. Also seed 5 as a
# second floor-ish point. ~1h.
set -x
cd /root/repo
LOG=/root/repo/artifacts/r5_bookshelf_ab.log
echo "=== $(date -u) start ===" >> $LOG

common="--seed_list 4,5 --epochs 150 --boxpc_epochs 40 --train_size 4096
  --val_size 1024 --num_point 512 --batch_size 64
  --weak_warmup_steps 2000 --diag --variants transfer"

echo "=== arm A: aniso_aug=0 (round-4 behavior) ===" >> $LOG
timeout 7200 python scripts/transfer_study.py $common \
  --boxpc_aniso_aug 0 --out_dir /tmp/bookshelf_ab_off \
  --out_json bookshelf_ab_off.json >> $LOG 2>&1 \
  && echo "+++ arm A ok" >> $LOG || echo "+++ arm A FAILED rc=$?" >> $LOG

echo "=== arm B: aniso_aug=0.8 (fix) ===" >> $LOG
timeout 7200 python scripts/transfer_study.py $common \
  --boxpc_aniso_aug 0.8 --out_dir /tmp/bookshelf_ab_on \
  --out_json bookshelf_ab_on.json >> $LOG 2>&1 \
  && echo "+++ arm B ok" >> $LOG || echo "+++ arm B FAILED rc=$?" >> $LOG

python - <<'EOF' >> $LOG 2>&1
import json
out = {}
for arm, f in (("off", "bookshelf_ab_off.json"), ("on", "bookshelf_ab_on.json")):
    try:
        runs = json.load(open(f))  # list of per-(variant,seed) dicts
        out[arm] = {f"seed{r['seed']}": {
            "mAP": r["mAP"], "bookshelf": r["per_class"].get("bookshelf")}
            for r in runs}
    except Exception as e:
        out[arm] = f"unavailable: {e}"
json.dump(out, open("bookshelf_ab.json", "w"), indent=1)
print("bookshelf_ab.json:", json.dumps(out))
EOF

echo "=== $(date -u) done ===" >> $LOG
