# This package marker keeps pytest from inserting tests/tpu/ onto
# sys.path, where its conftest.py would shadow tests/conftest.py for the
# 34 test modules that do `from conftest import ...`.
