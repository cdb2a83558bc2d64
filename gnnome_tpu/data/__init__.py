from .dataset import AssemblyGraphDataset, AssemblyGraphDatasetHiFi, AssemblyGraphDatasetONT  # noqa: F401
