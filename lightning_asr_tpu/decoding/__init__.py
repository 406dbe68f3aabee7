from .greedy import greedy_collapse_device, greedy_decode_to_strings

__all__ = ["greedy_collapse_device", "greedy_decode_to_strings"]
