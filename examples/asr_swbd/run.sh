#!/usr/bin/env bash
# Switchboard recipe — staged pipeline mirroring the reference
# examples/asr_swbd/run.sh (Stage 0-1 Kaldi data/feature prep, Stage 2
# dict+tokenization with non-lang symbols, Stage 3-5 subword LM
# binarize/train/eval, Stage 6 manifests, Stage 7 ASR training with
# scheduled sampling (+SpecAugment variant), Stage 8 decoding beam=35
# with LM shallow fusion 0.25 and swbd wer filters, Stage 9 averaging).
# Corpus prep (LDC swbd1 / eval2000 / rt03) stays with Kaldi's s5c local/
# scripts, as in the reference; everything from tokenization on runs here.
set -euo pipefail

stage=0
stop_stage=100
data=${data:-data}                  # {split}/feats.scp,text(+utt2num_frames)
model=${model:-lstm}                # lstm | lstm_specaug
exp=${exp:-exp/${model}_swbd}
train_set=train_nodup
valid_set=train_dev
test_sets="train_dev eval2000 rt03"
lm_epochs=25
nlsyms=${data}/nlsyms.txt           # [laughter], [noise], [vocalized-noise]
case ${model} in
  lstm) asr_config=examples/asr_swbd/lstm_swbd.yaml ;;
  lstm_specaug) asr_config=examples/asr_swbd/lstm_specaug_swbd.yaml ;;
  *) echo "unknown model ${model}"; exit 1 ;;
esac

. ./parse_options.sh 2>/dev/null || true

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "=== stage 0: corpus prep (external, Kaldi s5c local/ scripts) ==="
  echo "expects ${data}/{${train_set},${valid_set},eval2000,rt03}/{feats.scp,text}"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: non-lang symbols + vocabulary (reference Stage 2) ==="
  printf '[laughter]\n[noise]\n[vocalized-noise]\n' > ${nlsyms}
  python -m espresso_tpu.cli.prep text2vocabulary --vocabsize 1000 \
    --skip-ncols 1 ${data}/${train_set}/text > ${data}/dict.txt
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: LM text binarization (reference Stage 3) ==="
  for split in ${train_set} ${valid_set}; do
    cut -d' ' -f2- ${data}/${split}/text > ${data}/lm_${split}.txt || true
    python -m espresso_tpu.cli.prep binarize \
      --text ${data}/lm_${split}.txt --dict ${data}/dict.txt \
      --output-prefix ${data}/lm_${split}
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: subword LSTM LM training (reference Stage 4) ==="
  python -m espresso_tpu.cli.train \
    task.name=language_modeling_for_asr \
    dataset.data=${data} dataset.train_subset=lm_${train_set} \
    dataset.valid_subset=lm_${valid_set} \
    dataset.non_lang_syms=${nlsyms} \
    model.name=lstm_lm_swbd criterion.name=cross_entropy_v2 \
    optimization.lr=0.001 optimization.max_epoch=${lm_epochs} \
    checkpoint.save_dir=${exp}/lm
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "=== stage 5: LM evaluation (reference Stage 5) ==="
  python -m espresso_tpu.cli.eval_lm \
    task.name=language_modeling_for_asr dataset.data=${data} \
    dataset.non_lang_syms=${nlsyms} \
    dataset.gen_subset=lm_${valid_set} checkpoint.save_dir=${exp}/lm
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "=== stage 6: JSON manifests (reference Stage 6) ==="
  for split in ${train_set} ${valid_set} eval2000 rt03; do
    python -m espresso_tpu.cli.prep asr_prep_json \
      --feat-files ${data}/${split}/feats.scp \
      --text-files ${data}/${split}/text \
      --utt2num-frames-files ${data}/${split}/utt2num_frames \
      --output ${data}/${split}.json
  done
  python -m espresso_tpu.cli.prep compute_cmvn \
    --manifest ${data}/${train_set}.json --output ${data}/gcmvn.npz
fi

if [ ${stage} -le 7 ] && [ ${stop_stage} -ge 7 ]; then
  echo "=== stage 7: ASR training (reference Stage 7) ==="
  python -m espresso_tpu.cli.train --config ${asr_config} \
    dataset.data=${data} dataset.train_subset=${train_set} \
    dataset.valid_subset=${valid_set} \
    dataset.non_lang_syms=${nlsyms} \
    dataset.global_cmvn_stats_path=${data}/gcmvn.npz \
    task.scheduled_sampling=true \
    'task.scheduled_sampling_probs=[0.9,0.8,0.7,0.6]' \
    task.start_scheduled_sampling_epoch=6 \
    checkpoint.save_dir=${exp}/asr
fi

if [ ${stage} -le 8 ] && [ ${stop_stage} -ge 8 ]; then
  echo "=== stage 8: averaging + decoding (reference Stages 8 + averaging) ==="
  python -m espresso_tpu.cli.average_checkpoints \
    --inputs ${exp}/asr --num-epoch-checkpoints 10 \
    --output ${exp}/asr/checkpoint_avg || true
  wer_filter_opt=""
  [ -f local/wer_output_filter ] && \
    wer_filter_opt="generation.wer_output_filter=local/wer_output_filter"
  for split in ${test_sets}; do
    python -m espresso_tpu.cli.speech_recognize --config ${asr_config} \
      dataset.data=${data} dataset.gen_subset=${split} \
      dataset.non_lang_syms=${nlsyms} \
      dataset.global_cmvn_stats_path=${data}/gcmvn.npz \
      checkpoint.save_dir=${exp}/asr \
      generation.beam=35 generation.max_len_a=0.1 \
      generation.lm_path=${exp}/lm generation.lm_weight=0.25 \
      ${wer_filter_opt} \
      generation.results_path=${exp}/decode_${split}
    echo "--- ${split} ---"; cat ${exp}/decode_${split}/wer
  done
fi
