from ance_tpu.data.cache import TokenCache, TokenCacheWriter, merge_split_files
