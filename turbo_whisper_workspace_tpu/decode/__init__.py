"""Autoregressive decoding: tokenizer, greedy/beam search, long-form."""
