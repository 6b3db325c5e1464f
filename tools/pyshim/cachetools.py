"""Minimal LRUCache stand-in for pyiceberg's manifest cache."""
from collections import OrderedDict

class LRUCache(OrderedDict):
    def __init__(self, maxsize=128, **kw):
        super().__init__()
        self.maxsize = maxsize
    def __setitem__(self, k, v):
        if k in self:
            del self[k]
        elif len(self) >= self.maxsize:
            self.popitem(last=False)
        super().__setitem__(k, v)

def cached(cache, key=None, lock=None):
    def deco(fn):
        return fn
    return deco

def keys(*a, **k):
    return None

class _KeysModule:
    @staticmethod
    def hashkey(*a, **k):
        return tuple(a)
