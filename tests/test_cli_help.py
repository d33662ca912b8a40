"""Every registered command must at least import and print --help."""

import pytest

from wgbs_tools_tpu.cli.main import COMMANDS, main as cli_main


@pytest.mark.parametrize("cmd", sorted(COMMANDS))
def test_help(cmd, capsys):
    with pytest.raises(SystemExit) as e:
        cli_main([cmd, "--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
