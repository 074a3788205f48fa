"""Offline tests for the downloader's extraction/layout logic.

Builds fake archives with the OFFICIAL internal nesting (the SMPL zip ships
``SMPL_python_v.1.1.0/smpl/models/basicmodel_*.pkl`` etc. — cf.
/root/reference/src/smplfitter/download.py:161-308), runs the member-flattening
installer, and asserts that the loader's ``model_filename`` path resolution
succeeds — i.e. a user who runs the downloader gets a working install — by
actually constructing a BodyModel from each extracted tree.
"""

from __future__ import annotations

import io
import os
import os.path as osp
import pickle
import tarfile
import zipfile

import numpy as np
import pytest

from smplfitter_tpu import download
from smplfitter_tpu.utils import synthetic
from smplfitter_tpu.utils.modeldata import initialize, model_filename


def _raw_bytes(model_name, fmt, num_vertices=96, num_betas=4):
    raw, _kid = synthetic.make_raw_model(model_name, num_vertices, num_betas)
    buf = io.BytesIO()
    if fmt == 'npz':
        np.savez(buf, **raw)
    else:
        pickle.dump(raw, buf)
    return buf.getvalue()


def _write_zip(path, members):
    with zipfile.ZipFile(path, 'w') as zf:
        for name, data in members.items():
            zf.writestr(name, data)


def _write_tar_xz(path, members):
    with tarfile.open(path, 'w:xz') as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def _find_asset(remote_file):
    (asset,) = [a for a in download.ARCHIVES if a.remote_file == remote_file]
    return asset


@pytest.fixture()
def target(tmp_path):
    d = tmp_path / 'body_models'
    d.mkdir()
    return str(d)


def _install(tmp_path, target, remote_file, members, writer=_write_zip):
    asset = _find_asset(remote_file)
    archive = str(tmp_path / osp.basename(remote_file))
    writer(archive, members)
    installed = download.install_archive(archive, asset.layout, target)
    download.create_symlinks(asset.symlinks, target)
    return asset, installed


def test_smpl_zip_layout(tmp_path, target):
    pkl = _raw_bytes('smpl', 'pkl')
    members = {
        'SMPL_python_v.1.1.0/smpl/models/basicmodel_f_lbs_10_207_0_v1.1.0.pkl': pkl,
        'SMPL_python_v.1.1.0/smpl/models/basicmodel_m_lbs_10_207_0_v1.1.0.pkl': pkl,
        'SMPL_python_v.1.1.0/smpl/models/basicmodel_neutral_lbs_10_207_0_v1.1.0.pkl': pkl,
        'SMPL_python_v.1.1.0/smpl/smpl_webuser/serialization.py': b'# code',
        'SMPL_python_v.1.1.0/models/readme.txt': b'readme',
    }
    asset, installed = _install(tmp_path, target, 'SMPL_python_v.1.1.0.zip', members)

    assert sorted(installed) == [
        'smpl/basicmodel_f_lbs_10_207_0_v1.1.0.pkl',
        'smpl/basicmodel_m_lbs_10_207_0_v1.1.0.pkl',
        'smpl/basicmodel_neutral_lbs_10_207_0_v1.1.0.pkl',
    ]
    assert download.is_installed(asset, target)
    # Convenience symlinks resolve to the real files.
    for link in ('SMPL_MALE.pkl', 'SMPL_FEMALE.pkl', 'SMPL_NEUTRAL.pkl'):
        assert osp.exists(osp.join(target, 'smpl', link))

    # The loader finds every gender at the paths the downloader produced,
    # and the files actually load end-to-end (kid template from agora asset).
    np.save(osp.join(target, 'smpl', 'kid_template.npy'), np.zeros((96, 3)))
    for gender in ('female', 'male', 'neutral'):
        path = osp.join(target, 'smpl', model_filename('smpl', gender))
        assert osp.exists(path), path
        md = initialize('smpl', gender, osp.join(target, 'smpl'))
        assert md.num_joints == 24 and md.num_vertices == 96


def test_smplx_zips_layout(tmp_path, target):
    npz = _raw_bytes('smplx', 'npz')
    members = {
        f'models/smplx/SMPLX_{g}.npz': npz for g in ('NEUTRAL', 'MALE', 'FEMALE')
    }
    members['models/smplx/version.txt'] = b'v1.1'
    _, installed = _install(tmp_path, target, 'models_smplx_v1_1.zip', members)
    assert len(installed) == 3

    lh_members = {f'SMPLX_{g}.npz': npz for g in ('NEUTRAL', 'MALE', 'FEMALE')}
    _install(tmp_path, target, 'smplx_lockedhead_20230207.zip', lh_members)

    for name, root in (('smplx', 'smplx'), ('smplxlh', 'smplxlh')):
        np.save(osp.join(target, root, 'kid_template.npy'), np.zeros((96, 3)))
        md = initialize(name, 'neutral', osp.join(target, root))
        assert md.num_joints == 55


def test_smplx_auxiliary_archives(tmp_path, target):
    _install(
        tmp_path, target, 'smplx_flip_correspondences.zip',
        {'smplx_flip_correspondences.npz': b'npzdata'},
    )
    assert osp.exists(osp.join(target, 'smplx', 'smplx_flip_correspondences.npz'))

    _install(
        tmp_path, target, 'smplx_mano_flame_correspondences.zip',
        {
            'MANO_SMPLX_vertex_ids.pkl': b'pkl',
            'SMPL-X__FLAME_vertex_ids.npy': b'npy',
            'readme.txt': b'txt',
        },
    )
    assert osp.exists(osp.join(target, 'smplx', 'MANO_SMPLX_vertex_ids.pkl'))
    assert osp.exists(osp.join(target, 'smplx', 'SMPL-X__FLAME_vertex_ids.npy'))
    assert not osp.exists(osp.join(target, 'smplx', 'readme.txt'))

    _install(
        tmp_path, target, 'model_transfer.zip',
        {
            'transfer_data/smpl2smplx_deftrafo_setup.pkl': b'a',
            'transfer_data/smplx2smpl_deftrafo_setup.pkl': b'b',
            'transfer_data/meshes/readme.md': b'c',
        },
    )
    # Deftrafo setups land at the body_models ROOT (where the converter looks).
    assert osp.exists(osp.join(target, 'smpl2smplx_deftrafo_setup.pkl'))
    assert osp.exists(osp.join(target, 'smplx2smpl_deftrafo_setup.pkl'))


def test_mano_package_serves_both_families(tmp_path, target):
    mano_pkl = _raw_bytes('mano', 'pkl')
    smplh_pkl = _raw_bytes('smplh', 'pkl')
    members = {
        'mano_v1_2/models/MANO_LEFT.pkl': mano_pkl,
        'mano_v1_2/models/MANO_RIGHT.pkl': mano_pkl,
        'mano_v1_2/models/SMPLH_female.pkl': smplh_pkl,
        'mano_v1_2/models/SMPLH_male.pkl': smplh_pkl,
        'mano_v1_2/models/info.txt': b'info',
        'mano_v1_2/webuser/verts.py': b'# code',
    }
    asset, installed = _install(tmp_path, target, 'mano_v1_2.zip', members)
    assert download.is_installed(asset, target)
    assert osp.exists(osp.join(target, 'smplh', 'SMPLH_FEMALE.pkl'))  # symlink

    md = initialize('mano', 'neutral', osp.join(target, 'mano'))
    assert md.num_joints == 16
    np.save(osp.join(target, 'smplh', 'kid_template.npy'), np.zeros((96, 3)))
    md = initialize('smplh', 'female', osp.join(target, 'smplh'))
    assert md.num_joints == 52


def test_smplh16_tar_layout(tmp_path, target):
    npz = _raw_bytes('smplh16', 'npz')
    members = {
        'smplh/male/model.npz': npz,
        'smplh/female/model.npz': npz,
        'smplh/neutral/model.npz': npz,
        'smplh/LICENSE.txt': b'license',
    }
    asset, installed = _install(
        tmp_path, target, 'smplh.tar.xz', members, writer=_write_tar_xz
    )
    assert sorted(installed) == [
        'smplh16/female/model.npz', 'smplh16/male/model.npz',
        'smplh16/neutral/model.npz',
    ]
    assert download.is_installed(asset, target)
    np.save(osp.join(target, 'smplh16', 'kid_template.npy'), np.zeros((96, 3)))
    for gender in ('female', 'male', 'neutral'):
        md = initialize('smplh16', gender, osp.join(target, 'smplh16'))
        assert md.num_joints == 52


def test_kid_template_symlinks(tmp_path, target):
    # Simulate the agora FILES step: save templates, then link dependents.
    os.makedirs(osp.join(target, 'smpl'))
    os.makedirs(osp.join(target, 'smplh16'))
    os.makedirs(osp.join(target, 'smplxlh'))
    np.save(osp.join(target, 'smpl', 'kid_template.npy'), np.zeros((9, 3)))
    for fasset in download.FILES:
        if osp.exists(osp.join(target, fasset.dest)):
            download.create_symlinks(fasset.symlinks, target)
    assert osp.exists(osp.join(target, 'smplh16', 'kid_template.npy'))
    # smplxlh link not created: its target (smplx template) doesn't exist.
    assert not osp.lexists(osp.join(target, 'smplxlh', 'kid_template.npy'))


def test_idempotency_markers(tmp_path, target):
    asset = _find_asset('SMPL_python_v.1.1.0.zip')
    assert not download.is_installed(asset, target)
    for marker in asset.done_markers:
        path = osp.join(target, marker)
        os.makedirs(osp.dirname(path), exist_ok=True)
        with open(path, 'wb') as f:
            f.write(b'x')
    assert download.is_installed(asset, target)


def test_every_loader_path_has_a_producer():
    """Every (model, gender) the loader can resolve is produced by some
    archive's layout rule — the downloader covers the full model registry."""
    from smplfitter_tpu.utils.modeldata import GENDER_MAPS

    official_member = {
        'smpl': 'SMPL_python_v.1.1.0/smpl/models/basicmodel_{g}_lbs_10_207_0_v1.1.0.pkl',
        'smplx': 'models/smplx/SMPLX_{g}.npz',
        'smplxlh': 'SMPLX_{g}.npz',
        'smplh': 'mano_v1_2/models/SMPLH_{g}.pkl',
        'smplh16': 'smplh/{g}/model.npz',
        'mano': 'mano_v1_2/models/MANO_RIGHT.pkl',
    }
    layouts = {a.remote_file: a.layout for a in download.ARCHIVES}
    layout_for = {
        'smpl': layouts['SMPL_python_v.1.1.0.zip'],
        'smplx': layouts['models_smplx_v1_1.zip'],
        'smplxlh': layouts['smplx_lockedhead_20230207.zip'],
        'smplh': layouts['mano_v1_2.zip'],
        'smplh16': layouts['smplh.tar.xz'],
        'mano': layouts['mano_v1_2.zip'],
    }
    for model_name, member_tpl in official_member.items():
        gmap = GENDER_MAPS[model_name] or {'n': ''}
        for gender_str in gmap.values():
            member = member_tpl.format(g=gender_str)
            dest = layout_for[model_name](member)
            expected = osp.join(
                model_name, model_filename(model_name, _long(gender_str))
            ) if model_name != 'smplxmoyo' else None
            assert dest == expected, (model_name, member, dest, expected)


def _long(gender_str):
    return {
        'f': 'female', 'm': 'male', 'neutral': 'neutral', 'FEMALE': 'female',
        'MALE': 'male', 'NEUTRAL': 'neutral', 'female': 'female', 'male': 'male',
        '': 'neutral',
    }[gender_str]
