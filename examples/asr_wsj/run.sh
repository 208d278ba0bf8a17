#!/usr/bin/env bash
# WSJ recipe — staged pipeline mirroring the reference examples/asr_wsj/run.sh:
# char-level LSTM ASR, subword (char) LM + word LM, decode with look-ahead
# word-LM fusion (Stage 10 operating point: beam=50, lm_weight=0.9,
# oov_penalty=1e-7, eos_factor=1.5).
set -euo pipefail

stage=0
stop_stage=100
data=${data:-data}
exp=${exp:-exp/lstm_wsj}
train_set=train_si284
valid_set=test_dev93
test_set=test_eval92

. ./parse_options.sh 2>/dev/null || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "=== stage 1: manifests + char dict ==="
  for split in ${train_set} ${valid_set} ${test_set}; do
    python -m espresso_tpu.cli.prep asr_prep_json \
      --feat-files ${data}/${split}/feats.scp \
      --text-files ${data}/${split}/text \
      --utt2num-frames-files ${data}/${split}/utt2num_frames \
      --output ${data}/${split}.json
  done
  python -m espresso_tpu.cli.prep text2token --skip-ncols 1 \
    ${data}/${train_set}/text > ${data}/tokens.txt
  python -m espresso_tpu.cli.prep text2vocabulary ${data}/tokens.txt \
    > ${data}/dict.txt
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: char LM + word LM ==="
  python -m espresso_tpu.cli.train \
    task.name=language_modeling_for_asr dataset.data=${data} \
    model.name=lstm_lm_wsj criterion.name=cross_entropy_v2 \
    optimization.lr=0.001 optimization.max_epoch=25 \
    checkpoint.save_dir=${exp}/lm
  # word LM over the word vocabulary (look-ahead fusion,
  # external_language_model.py lineage)
  mkdir -p ${data}/wordlm
  python -m espresso_tpu.cli.prep text2vocabulary --vocabsize 65000 \
    --skip-ncols 1 ${data}/${train_set}/text > ${data}/wordlm/dict.txt
  cp ${data}/lm_*.txt ${data}/wordlm/ 2>/dev/null || true
  python -m espresso_tpu.cli.train \
    task.name=language_modeling_for_asr dataset.data=${data}/wordlm \
    model.name=lstm_wordlm_wsj criterion.name=cross_entropy_v2 \
    optimization.lr=0.001 optimization.max_epoch=25 \
    checkpoint.save_dir=${exp}/wordlm
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: ASR training ==="
  python -m espresso_tpu.cli.train --config examples/asr_wsj/lstm_wsj.yaml \
    dataset.data=${data} dataset.train_subset=${train_set} \
    dataset.valid_subset=${valid_set} \
    checkpoint.save_dir=${exp}/asr
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: decode with look-ahead word-LM fusion ==="
  python -m espresso_tpu.cli.speech_recognize \
    dataset.data=${data} dataset.gen_subset=${test_set} \
    checkpoint.save_dir=${exp}/asr \
    generation.beam=50 generation.eos_factor=1.5 \
    generation.word_lm_path=${exp}/wordlm generation.lm_weight=0.9 \
    generation.oov_penalty=1e-7 \
    generation.results_path=${exp}/decode_${test_set}
  cat ${exp}/decode_${test_set}/wer
fi
