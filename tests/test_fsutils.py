"""Unit tests for utils/fsutils.py (filesystem_utils.h POSIX semantics)."""

import os

from realsr_tpu.utils.fsutils import (
    get_file_extension,
    get_file_name_without_extension,
    list_directory,
    path_is_directory,
    sanitize_filepath,
)


def test_extension_helpers():
    assert get_file_extension("a/b/c.PNG") == "PNG"
    assert get_file_extension("noext") == ""
    assert get_file_extension("weird.tar.gz") == "gz"
    assert get_file_name_without_extension("a/b/c.png") == "c"
    assert get_file_name_without_extension("noext") == "noext"


def test_list_directory_sorted_files_only(tmp_path):
    (tmp_path / "b.png").write_bytes(b"x")
    (tmp_path / "a.png").write_bytes(b"x")
    (tmp_path / "sub").mkdir()  # directories are excluded
    assert path_is_directory(str(tmp_path))
    assert not path_is_directory(str(tmp_path / "a.png"))
    assert list_directory(str(tmp_path)) == ["a.png", "b.png"]


def test_sanitize_filepath(tmp_path, monkeypatch):
    p = tmp_path / "exists.txt"
    p.write_text("x")
    assert sanitize_filepath(str(p)) == str(p)
    # absolute missing path comes back unchanged (os.path.join with an
    # absolute second argument discards the root — matches the C++ CLI's
    # absolute-path passthrough)
    assert sanitize_filepath("/definitely/missing") == "/definitely/missing"
    # relative path that exists only under the install root resolves there
    # (filesystem_utils.h:167-173 exe-relative fallback)
    from realsr_tpu.utils.fsutils import install_root

    repo = os.path.dirname(install_root())
    monkeypatch.chdir(tmp_path)  # CWD-relative README.md does not exist
    assert sanitize_filepath("README.md") == os.path.join(repo, "README.md")
    # relative path existing nowhere comes back unchanged
    assert sanitize_filepath("missing-everywhere") == "missing-everywhere"
