# scripts/ is importable as a package solely so its files can share
# scripts._lib.load_sibling; every script remains directly runnable.
