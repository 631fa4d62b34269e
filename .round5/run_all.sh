#!/bin/bash
# Round-5 driver. Priority order per VERDICT r4 #6: trainings/evals FIRST
# (the accuracy evidence), benches after. Idempotent via status files;
# failures propagate: each step records .round5/status/<name>.exit, evals are
# skipped when their producing train step failed, and the script exits
# non-zero if anything failed.
cd /root/repo
mkdir -p .round5/logs .round5/status .round5/out
export PYTHONUNBUFFERED=1

run() {
  local name="$1"; shift
  if [ -f ".round5/status/$name.exit" ] && [ "$(cat ".round5/status/$name.exit")" = "0" ]; then
    echo "== skip $name (done)"; return 0
  fi
  echo "== start $name: $* $(date +%T)"
  local t0=$SECONDS
  "$@" > ".round5/logs/$name.log" 2>&1
  local rc=$?
  echo "$rc" > ".round5/status/$name.exit"
  echo "$((SECONDS-t0))" > ".round5/status/$name.secs"
  echo "== done $name rc=$rc $(( SECONDS-t0 ))s $(date +%T)"
  return $rc
}

need() {
  local dep="$1"
  [ -f ".round5/status/$dep.exit" ] && [ "$(cat ".round5/status/$dep.exit")" = "0" ]
}

# --- Phase A: the CDPN-syn regression investigation (r4: 85.0 -> 56.2) ----
# Arms: (a) HEAD defaults = S2D stem on, seed 42 — the r4 recipe;
#       (b) S2D stem off (the r3 recipe's stem);
#       (c) seed 43 — sizes plain seed/chaos variance at 3000 steps.
# Each eval: deterministic (solver seed 0) AND non-det (solver seed 1, the
# r3 eval's seed) on the SAME checkpoint — sizes solver-seed sensitivity.
SYN_OPTS="train.num_steps=3000 train.test_every=0 train.ckpt_every=1000"

run train_syn_a python -m lc_tpu.train --config configs/syn.yaml --name syn-a \
  --output .round5/out --opts $SYN_OPTS
need train_syn_a && run eval_syn_a_det python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round5/out/syn-a-1/model_final.ckpt --output .round5/out/eval_syn_a_det --obj 1 --deterministic
need train_syn_a && run eval_syn_a_nondet python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round5/out/syn-a-1/model_final.ckpt --output .round5/out/eval_syn_a_nondet --obj 1

run train_syn_s2d0 env LC_TPU_STEM_S2D=0 python -m lc_tpu.train --config configs/syn.yaml \
  --name syn-s2d0 --output .round5/out --opts $SYN_OPTS
need train_syn_s2d0 && run eval_syn_s2d0_det env LC_TPU_STEM_S2D=0 python -m lc_tpu.test \
  --config configs/syn.yaml --weight .round5/out/syn-s2d0-1/model_final.ckpt \
  --output .round5/out/eval_syn_s2d0_det --obj 1 --deterministic
need train_syn_s2d0 && run eval_syn_s2d0_nondet env LC_TPU_STEM_S2D=0 python -m lc_tpu.test \
  --config configs/syn.yaml --weight .round5/out/syn-s2d0-1/model_final.ckpt \
  --output .round5/out/eval_syn_s2d0_nondet --obj 1

run train_syn_seed43 python -m lc_tpu.train --config configs/syn.yaml --name syn-seed43 \
  --output .round5/out --opts $SYN_OPTS train.seed=43
need train_syn_seed43 && run eval_syn_seed43_det python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round5/out/syn-seed43-1/model_final.ckpt --output .round5/out/eval_syn_seed43_det --obj 1 --deterministic

# --- Phase B: zebra checkpoint + int8 static-vs-dynamic accuracy delta ----
run train_zsyn python -m lc_tpu.train --config configs/zsyn.yaml --output .round5/out
need train_zsyn && run eval_zsyn_f32 python -m lc_tpu.test --config configs/zsyn.yaml \
  --weight .round5/out/zsyn-1/model_final.ckpt --output .round5/out/eval_zsyn_f32 --obj 1 --deterministic
need train_zsyn && run eval_zsyn_int8dyn python -m lc_tpu.test --config configs/zsyn.yaml \
  --weight .round5/out/zsyn-1/model_final.ckpt --output .round5/out/eval_zsyn_int8dyn --obj 1 --deterministic \
  --opts int8_inference=true
need train_zsyn && run eval_zsyn_int8static python -m lc_tpu.test --config configs/zsyn.yaml \
  --weight .round5/out/zsyn-1/model_final.ckpt --output .round5/out/eval_zsyn_int8static --obj 1 --deterministic \
  --opts int8_inference=true int8_act_scales=static
need train_syn_a && run eval_syn_a_int8dyn python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round5/out/syn-a-1/model_final.ckpt --output .round5/out/eval_syn_a_int8dyn --obj 1 --deterministic \
  --opts int8_inference=true
need train_syn_a && run eval_syn_a_int8static python -m lc_tpu.test --config configs/syn.yaml \
  --weight .round5/out/syn-a-1/model_final.ckpt --output .round5/out/eval_syn_a_int8static --obj 1 --deterministic \
  --opts int8_inference=true int8_act_scales=static

# --- Phase C: benches (short, TPU) ---------------------------------------
run bench_headline        python bench.py
run bench_int8            python bench.py --mode int8
run bench_int8_static     python bench.py --mode int8_static
run bench_zebra           python bench.py --mode zebra
run bench_zebra_int8      python bench.py --mode zebra_int8
run bench_zebra_int8_static python bench.py --mode zebra_int8_static
run bench_sparse          python bench.py --mode sparse
run bench_int8_mfu        python bench.py --mode int8_mfu
run bench_zebra_int8_mfu  python bench.py --mode zebra_int8_mfu
run bench_int8_stages     python bench.py --mode int8_stages
run bench_zebra_int8_stages python bench.py --mode zebra_int8_stages
run bench_mfu_stages_s2d1 env LC_TPU_STEM_S2D=1 python bench.py --mode mfu_stages
run bench_mfu_stages_s2d0 env LC_TPU_STEM_S2D=0 python bench.py --mode mfu_stages
run bench_zebra_train_trace python bench.py --mode zebra_train_trace
run int8_lowering         python tools/check_int8_lowering.py

fails=0
for f in .round5/status/*.exit; do
  rc=$(cat "$f")
  if [ "$rc" != "0" ]; then echo "== FAILED: $(basename "$f" .exit) rc=$rc"; fails=$((fails+1)); fi
done
if [ "$fails" != "0" ]; then echo "== DONE WITH $fails FAILURE(S) $(date +%T)"; exit 1; fi
echo "== ALL DONE $(date +%T)"
