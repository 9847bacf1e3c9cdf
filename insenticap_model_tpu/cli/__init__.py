"""CLI entry points preserving the reference's command surface
(train_cpt / train_senti / train_sent_senti_cls_rnn / train_xe / train_rl /
detect_concepts / test_cpt / eval_senti / eval_cls_rnn / eval_ppl /
preprocess), each re-implemented over the TPU-native stack."""
