#!/usr/bin/env bash
# WSJ end-to-end LF-MMI (chain) recipe — mirrors the reference
# examples/asr_wsj/run_chain_e2e.sh: TDNN trained with lattice-free MMI on
# numerator FSTs, posteriors dumped and decoded to pruned lattices with the
# in-tree FST decoder (replacing latgen-faster-mapped), scored with an
# LMWT x word-insertion-penalty sweep (replacing local/score.sh), and
# LM-rescored with bigger ARPA LMs (replacing steps/lmrescore.sh and
# steps/lmrescore_const_arpa.sh; reference lines 218-233).
# The denominator graph (den.fst) and per-utterance numerator FSTs come from
# a Kaldi chain e2e dir (train_e2e.py style).
set -euo pipefail

stage=0
stop_stage=100
data=${data:-data}
exp=${exp:-exp/chain_e2e}
chain_dir=${chain_dir:-${data}/chain_e2e}   # den.fst + num_fsts archives
train_set=train_si284_spe2e
valid_set=test_dev93
test_set=test_eval92

. ./parse_options.sh 2>/dev/null || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "=== stage 1: convert denominator FST (binary OpenFst -> npz) ==="
  python - <<PY
from espresso_tpu.ops.chain import DenominatorGraph
g = DenominatorGraph.load("${chain_dir}/den.fst")
g.save("${chain_dir}/den.npz")
PY
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: LF-MMI training (pychain-equivalent on-device) ==="
  python -m espresso_tpu.cli.train \
    task.name=speech_recognition_hybrid dataset.data=${data} \
    dataset.train_subset=${train_set} dataset.valid_subset=${valid_set} \
    task.num_targets=$(cat ${chain_dir}/num_pdfs) \
    criterion.name=lf_mmi_loss \
    criterion.denominator_graph_path=${chain_dir}/den.npz \
    criterion.leaky_hmm_coefficient=1e-5 \
    model.name=speech_tdnn \
    optimization.lr=0.001 optimization.max_epoch=15 \
    checkpoint.save_dir=${exp}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: dump posteriors for lattice decoding ==="
  python -m espresso_tpu.cli.dump_posteriors \
    task.name=speech_recognition_hybrid dataset.data=${data} \
    dataset.gen_subset=${test_set} \
    task.num_targets=$(cat ${chain_dir}/num_pdfs) \
    checkpoint.save_dir=${exp} \
    > ${exp}/posteriors_${test_set}.ark
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: in-tree lattice generation (replaces latgen-faster-mapped) ==="
  # graph: OpenFst text-format HCLG (e.g. fstprint graph/HCLG.fst)
  python -m espresso_tpu.cli.latgen \
    --posteriors ${exp}/posteriors_${test_set}.ark \
    --graph ${chain_dir}/HCLG.fst.txt --words ${chain_dir}/words.txt \
    --acoustic-scale 1.0 --beam 15 --lattice-beam 8 \
    --min-active 20 --max-active 7000 \
    --lattices-path ${exp}/decode_${test_set}/lat.npz \
    --results-path ${exp}/decode_${test_set} \
    --ref ${data}/${test_set}_text
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "=== stage 5: sweep-score lattices (replaces local/score.sh) ==="
  # the reference pre-scales lattices by acoustic-scale=10.0 then sweeps
  # --inv-acoustic-scale=LMWT in [7,17] x word-ins-penalty {0.0,0.5,1.0}
  python -m espresso_tpu.cli.score_lattices \
    --lattices ${exp}/decode_${test_set}/lat.npz \
    --words ${chain_dir}/words.txt \
    --ref ${data}/${test_set}_text \
    --results-path ${exp}/decode_${test_set}/scoring \
    --min-lmwt 7 --max-lmwt 17 --wip 0.0,0.5,1.0 \
    --pre-acoustic-scale 10.0
  cat ${exp}/decode_${test_set}/scoring/best_wer
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "=== stage 6: ARPA LM lattice rescoring (replaces steps/lmrescore*.sh) ==="
  # swap the decoding-graph LM for a bigger one (mode-3 lmrescore): subtract
  # the old G scores, add the new LM's; then re-run the scoring sweep.
  # lm_old/lm_new default to the WSJ tgpr -> fgconst pairing when present.
  lm_old=${lm_old:-${data}/local/lm/lm_tgpr.arpa}
  lm_new=${lm_new:-${data}/local/lm/lm_fgconst.arpa}
  if [ -f "${lm_old}" ] && [ -f "${lm_new}" ]; then
    python -m espresso_tpu.cli.lmrescore \
      --lattices ${exp}/decode_${test_set}/lat.npz \
      --words ${chain_dir}/words.txt \
      --old-arpa ${lm_old} --arpa ${lm_new} \
      --out ${exp}/decode_${test_set}_fg/lat.npz
    python -m espresso_tpu.cli.score_lattices \
      --lattices ${exp}/decode_${test_set}_fg/lat.npz \
      --words ${chain_dir}/words.txt \
      --ref ${data}/${test_set}_text \
      --results-path ${exp}/decode_${test_set}_fg/scoring \
      --min-lmwt 7 --max-lmwt 17 --wip 0.0,0.5,1.0 \
      --pre-acoustic-scale 10.0
    cat ${exp}/decode_${test_set}_fg/scoring/best_wer
  else
    echo "skip: ARPA LMs not found (${lm_old}, ${lm_new})"
  fi
fi
