#!/usr/bin/env bash
# End-to-end walkthrough on a hermetic synthetic corpus: generate data,
# train, evaluate (with per-type breakdown), run a sweep, and predict.
# Works on CPU or TPU. Usage:  bash examples/walkthrough.sh [workdir]
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/dl_vqa_walkthrough}"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

echo "== 1. synthetic corpus (learnable: answers derivable from pixels) =="
python -m dl_vqa_tpu.data.synthetic "$WORK/data" \
  --n-train 128 --n-val 64 --n-images 10 --image-size 64 --max-answers 20 \
  --learnable

# Shared overrides: point the 'small' profile at the corpus and shrink the
# model so this runs in seconds anywhere.
OV=(
  main.use_full=false
  main.small.paths.base_path="$WORK/data"
  main.small.paths.vocab_path="$WORK/data/vocab.json"
  main.small.paths.logs="$WORK/logs/"
  main.small.train_paths.questions=train_questions.json
  main.small.train_paths.answers=train_annotations.json
  main.small.train_paths.processed_imgs="$WORK/data/processed_train_images.h5"
  main.small.train_paths.vqaDataset="$WORK/ds_train.npz"
  main.small.val_paths.questions=val_questions.json
  main.small.val_paths.answers=val_annotations.json
  main.small.val_paths.processed_imgs="$WORK/data/processed_val_images.h5"
  main.small.val_paths.vqaDataset="$WORK/ds_val.npz"
  train.num_epochs=2 train.batch_size=16 train.max_answers=20
  train.image_size=64 train.text.question_features=32
  train.text.embedding_features=16 "train.image.num_channels=[3, 8, 16]"
  train.attention.hidden_dim=24 train.classifier.hidden_dim=32
)
printf '%s\n' "${OV[@]}" > "$WORK/overrides.txt"   # for the serve step

echo "== 2. train =="
python "$REPO/main.py" "${OV[@]}"
CKPT=$(ls -t "$WORK"/logs/*/model.ckpt | head -1)
echo "best checkpoint: $CKPT"

echo "== 3. evaluate (overall + per-answer-type) =="
python "$REPO/evaluate_vqa.py" "${OV[@]}" \
  main.small.paths.pretrained_model_path="$CKPT"

echo "== 4. sweep the reference's Ax space (2 quick trials) =="
python "$REPO/sweep.py" --trials 2 \
  --space "train.attention.do_option=+,*" "${OV[@]}"

echo "== 5. predict =="
IMG=$(ls "$WORK"/data/val2014/*.jpg | head -1)
python "$REPO/predict.py" --image "$IMG" --question "what color is the cat" \
  --top-k 3 "${OV[@]}" main.small.paths.pretrained_model_path="$CKPT"

echo "== 6. official VQA submission file =="
python "$REPO/predict.py" --submission "$WORK/results.json" "${OV[@]}" \
  main.small.paths.pretrained_model_path="$CKPT"
python -c "import json; d = json.load(open('$WORK/results.json')); \
print('submission entries:', len(d), 'first:', d[0])"

echo "== 7. Hydra-style multirun sweep (round 2) =="
python "$REPO/main.py" -m "${OV[@]}" train.image.stride=1,2

echo "== 8. serving daemon (round 2): one request over HTTP =="
python - "$REPO" "$WORK" "$CKPT" <<'PYEOF'
import base64, glob, json, sys, threading, urllib.request
repo, work, ckpt = sys.argv[1:4]
sys.path.insert(0, repo)
from dl_vqa_tpu import config as config_mod
import serve
overrides = [ln for ln in open(f"{work}/overrides.txt").read().split("\n") if ln]
cfg = config_mod.compose("config_eval",
                         overrides=overrides
                         + [f"main.small.paths.pretrained_model_path={ckpt}"])
httpd, service = serve.build_server(cfg, port=0)
threading.Thread(target=httpd.serve_forever, daemon=True).start()
img = sorted(glob.glob(f"{work}/data/val2014/*.jpg"))[0]
payload = {"image_b64": base64.b64encode(open(img, "rb").read()).decode(),
           "question": "what color is the cat?", "top_k": 3}
req = urllib.request.Request(
    f"http://127.0.0.1:{httpd.server_address[1]}/v1/answer",
    data=json.dumps(payload).encode(),
    headers={"Content-Type": "application/json"})
with urllib.request.urlopen(req, timeout=60) as resp:
    print("serve answers:", json.loads(resp.read())["answers"])
service.stop(); httpd.shutdown()
PYEOF

echo "walkthrough complete: artifacts in $WORK"
