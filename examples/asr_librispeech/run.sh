#!/usr/bin/env bash
# LibriSpeech recipe — staged pipeline mirroring the reference
# examples/asr_librispeech/run.sh (stages: prep -> vocab -> LM -> ASR -> decode).
# Data prep assumes Kaldi-style inputs (feats.scp/text per split) or wav
# manifests; feature extraction itself runs on-device (fused fbank) so no
# Kaldi binary is required for the e2e path.
set -euo pipefail

stage=0
stop_stage=100
data=${data:-data}            # {split}/feats.scp,text or {split}/wav.scp
# model selector (reference run.sh use_transformer/apply_specaug flags):
#   lstm | lstm_specaug | transformer | transformer_ctc | conformer_transducer
model=${model:-lstm}
exp=${exp:-exp/${model}_librispeech}
train_set=train_960
valid_set=dev
test_sets="test_clean test_other"
lm_epochs=30
case ${model} in
  lstm) asr_config=examples/asr_librispeech/lstm_librispeech.yaml
        lm_weight=0.47 ;;
  lstm_specaug)
        asr_config=examples/asr_librispeech/lstm_specaug_librispeech.yaml
        lm_weight=0.4 ;;
  transformer)
        asr_config=examples/asr_librispeech/transformer_librispeech.yaml
        lm_weight=0.4 ;;
  transformer_ctc)
        asr_config=examples/asr_librispeech/transformer_ctc_librispeech.yaml
        lm_weight=0.0 ;;
  conformer_transducer)
        asr_config=examples/asr_librispeech/conformer_transducer_librispeech.yaml
        lm_weight=0.0 ;;
  *) echo "unknown model ${model}"; exit 1 ;;
esac

. ./parse_options.sh 2>/dev/null || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "=== stage 1: JSON manifests (asr_prep_json) ==="
  for split in ${train_set} ${valid_set} ${test_sets}; do
    python -m espresso_tpu.cli.prep asr_prep_json \
      --feat-files ${data}/${split}/feats.scp \
      --text-files ${data}/${split}/text \
      --utt2num-frames-files ${data}/${split}/utt2num_frames \
      --output ${data}/${split}.json
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "=== stage 2: vocabulary + global CMVN ==="
  python -m espresso_tpu.cli.prep text2vocabulary --vocabsize 5000 \
    --skip-ncols 1 ${data}/${train_set}/text > ${data}/dict.txt
  python -m espresso_tpu.cli.prep compute_cmvn \
    --manifest ${data}/${train_set}.json --output ${data}/gcmvn.npz
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "=== stage 3: subword LSTM LM (fusion LM, reference run.sh:195-229) ==="
  for split in ${train_set} ${valid_set}; do
    cut -d' ' -f2- ${data}/${split}/text > ${data}/lm_${split}.txt || true
  done
  python -m espresso_tpu.cli.train \
    task.name=language_modeling_for_asr \
    dataset.data=${data} dataset.train_subset=lm_${train_set} \
    dataset.valid_subset=lm_${valid_set} \
    model.name=lstm_lm_librispeech criterion.name=cross_entropy_v2 \
    optimization.lr=0.001 optimization.max_epoch=${lm_epochs} \
    checkpoint.save_dir=${exp}/lm
  python -m espresso_tpu.cli.eval_lm \
    task.name=language_modeling_for_asr dataset.data=${data} \
    dataset.gen_subset=lm_${valid_set} checkpoint.save_dir=${exp}/lm
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "=== stage 4: ASR training ==="
  python -m espresso_tpu.cli.train --config ${asr_config} \
    dataset.data=${data} dataset.train_subset=${train_set} \
    dataset.valid_subset=${valid_set} \
    dataset.global_cmvn_stats_path=${data}/gcmvn.npz \
    checkpoint.save_dir=${exp}/asr
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "=== stage 5: checkpoint averaging + decode + WER ==="
  python -m espresso_tpu.cli.average_checkpoints \
    --inputs ${exp}/asr --num-epoch-checkpoints 5 \
    --output ${exp}/asr/checkpoint_avg || true
  lm_opts=""
  if [ "${lm_weight}" != "0.0" ]; then
    # shallow fusion (reference run.sh:271-279; 0.4 with specaug, 0.47 else)
    lm_opts="generation.lm_path=${exp}/lm generation.lm_weight=${lm_weight} generation.eos_factor=1.5"
  fi
  for split in ${test_sets}; do
    python -m espresso_tpu.cli.speech_recognize --config ${asr_config} \
      dataset.data=${data} dataset.gen_subset=${split} \
      dataset.global_cmvn_stats_path=${data}/gcmvn.npz \
      checkpoint.save_dir=${exp}/asr \
      generation.max_len_a=0.08 \
      ${lm_opts} \
      generation.results_path=${exp}/decode_${split}
    echo "--- ${split} ---"; cat ${exp}/decode_${split}/wer
  done
fi
