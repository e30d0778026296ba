"""Dataset registry (mirrors /root/reference/data/__init__.py:6-10) + synthetic."""


def _lazy(name):
    def load(*a, **k):
        if name == "nsff":
            from .nsff import NSFFDataset
            return NSFFDataset(*a, **k)
        if name == "llff":
            from .llff import LLFFDataset
            return LLFFDataset(*a, **k)
        if name == "dtu":
            from .dtu import DTUDataset
            return DTUDataset(*a, **k)
        if name == "neural3Dvideo":
            from .neural3dvideo import Neural3DVideoDataset
            return Neural3DVideoDataset(*a, **k)
        if name == "synthetic":
            from .synthetic import SyntheticDataset
            return SyntheticDataset(*a, **k)
        raise KeyError(name)
    return load


dataset_dict = {name: _lazy(name)
                for name in ("dtu", "llff", "neural3Dvideo", "nsff", "synthetic")}
