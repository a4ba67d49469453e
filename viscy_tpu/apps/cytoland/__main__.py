"""``python -m viscy_tpu.apps.cytoland`` -> shared viscy CLI
(reference ``cytoland/__main__.py:9``)."""

from viscy_tpu.training.cli import main

if __name__ == "__main__":
    main()
