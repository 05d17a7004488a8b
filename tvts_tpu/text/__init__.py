from tvts_tpu.text.tokenizer import ClipBpeTokenizer, tokenize, tokenize_openclip
