import os

SCRIPTS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "scripts"))
