#!/bin/bash
# Round-4 TPU measurement + training driver. Idempotent: each step records
# .round4/status/<name>.exit and is skipped on re-run if it already passed,
# so the script can be relaunched after a crash and resumes where it left off.
cd /root/repo
mkdir -p .round4/logs .round4/status .round4/results .round4/out
export PYTHONUNBUFFERED=1

run() {
  local name="$1"; shift
  if [ -f ".round4/status/$name.exit" ] && [ "$(cat ".round4/status/$name.exit")" = "0" ]; then
    echo "== skip $name (done)"; return 0
  fi
  echo "== start $name: $* $(date +%T)"
  local t0=$SECONDS
  "$@" > ".round4/logs/$name.log" 2>&1
  local rc=$?
  echo "$rc" > ".round4/status/$name.exit"
  echo "$((SECONDS-t0))" > ".round4/status/$name.secs"
  echo "== done $name rc=$rc $(( SECONDS-t0 ))s $(date +%T)"
  return $rc
}

# skip an eval when the training that produces its checkpoint failed
need() {
  local dep="$1"
  [ -f ".round4/status/$dep.exit" ] && [ "$(cat ".round4/status/$dep.exit")" = "0" ]
}

# --- Phase A: benches (short, TPU) -------------------------------------
run bench_headline   python bench.py
run bench_int8       python bench.py --mode int8
run bench_zebra      python bench.py --mode zebra
run bench_zebra_int8 python bench.py --mode zebra_int8
run bench_sparse     python bench.py --mode sparse
run bench_mfu_s2d1   env LC_TPU_STEM_S2D=1 python bench.py --mode mfu
run bench_mfu_s2d0   env LC_TPU_STEM_S2D=0 python bench.py --mode mfu
run bench_mfu_stages_s2d1 env LC_TPU_STEM_S2D=1 python bench.py --mode mfu_stages
run bench_mfu_stages_s2d0 env LC_TPU_STEM_S2D=0 python bench.py --mode mfu_stages
run bench_zebra_mfu  python bench.py --mode zebra_mfu
run int8_lowering    python tools/check_int8_lowering.py

# --- Phase B: trainings + evals (long, TPU) ----------------------------
run train_syn python -m lc_tpu.train --config configs/syn.yaml \
  --output .round4/out --opts train.num_steps=3000 train.test_every=0 train.ckpt_every=1000
need train_syn && run eval_syn_f32 python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round4/out/syn-1/model_final.ckpt --output .round4/out/eval_syn_f32 --obj 1 --deterministic
need train_syn && run eval_syn_int8 python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round4/out/syn-1/model_final.ckpt --output .round4/out/eval_syn_int8 --obj 1 --deterministic \
  --opts int8_inference=true

run train_zsyn python -m lc_tpu.train --config configs/zsyn.yaml --output .round4/out
need train_zsyn && run eval_zsyn_f32 python -m lc_tpu.test --config configs/zsyn.yaml \
  --weight .round4/out/zsyn-1/model_final.ckpt --output .round4/out/eval_zsyn_f32 --obj 1 --deterministic
need train_zsyn && run eval_zsyn_int8 python -m lc_tpu.test --config configs/zsyn.yaml \
  --weight .round4/out/zsyn-1/model_final.ckpt --output .round4/out/eval_zsyn_int8 --obj 1 --deterministic \
  --opts int8_inference=true

run train_gspsyn python -m lc_tpu.train --config configs/gspsyn.yaml --output .round4/out
need train_gspsyn && run eval_gspsyn_f32 python -m lc_tpu.test --config configs/gspsyn.yaml \
  --weight .round4/out/gspsyn-1/model_final.ckpt --output .round4/out/eval_gspsyn_f32 --obj 1 --deterministic

fails=0
for f in .round4/status/*.exit; do
  rc=$(cat "$f")
  if [ "$rc" != "0" ]; then echo "== FAILED: $(basename "$f" .exit) rc=$rc"; fails=$((fails+1)); fi
done
if [ "$fails" != "0" ]; then echo "== DONE WITH $fails FAILURE(S) $(date +%T)"; exit 1; fi
echo "== ALL DONE $(date +%T)"
