from multithreading_string_matching_tpu.models.kmp import lps_table, kmp_dfa, stack_kmp_dfas
from multithreading_string_matching_tpu.models.aho_corasick import AhoCorasick

__all__ = ["lps_table", "kmp_dfa", "stack_kmp_dfas", "AhoCorasick"]
