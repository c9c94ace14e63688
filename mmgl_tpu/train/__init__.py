from mmgl_tpu.train.losses import causal_lm_loss, seq2seq_loss, summary_loss  # noqa: F401
