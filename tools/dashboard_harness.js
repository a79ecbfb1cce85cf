// Dashboard client harness: run the page's JS under node with a stub
// DOM/fetch/EventSource and drive the three views (run list -> detail with
// SVG chart -> compare with overlay), plus an XSS-escaping check.
// Complements ServerSpec (which covers the HTTP routes + page serving):
// this exercises the client-side render logic itself, since no browser
// ships in the build container.  Usage: node tools/dashboard_harness.js
// Minimal DOM harness for the dashboard client: stub document/fetch/
// EventSource, load the script, drive list -> detail -> compare.
const fs = require('fs');
// extract the client script from the served resource; strip 'use strict'
// so eval'd function declarations land in this harness scope
const html = fs.readFileSync(
  __dirname + '/../src/main/resources/graft/dashboard.html', 'utf8');
const src = html.match(/<script>([\s\S]*)<\/script>/)[1]
  .replace("'use strict';", '');

const elements = {};
function makeEl(id) {
  return {
    id, _html: '', style: {}, value: '', listeners: {},
    set innerHTML(h) { this._html = h; }, get innerHTML() { return this._html; },
    addEventListener(ev, fn) { this.listeners[ev] = fn; },
    classList: { add(){}, remove(){} },
  };
}
for (const id of ['live','cmpbtn','search','runlist','empty','detail','compare'])
  elements[id] = makeEl(id);
// metricsel is created dynamically by openRun's innerHTML; return a stub
global.document = { getElementById: id => elements[id] || (elements[id] = makeEl(id)) };
global.EventSource = class { constructor(){ setTimeout(()=>{},0); } set onopen(f){} set onerror(f){} set onmessage(f){} };

const runs = [
  { id: 'r1', name: 'sweep-1', project: 'demo', status: 'completed', started_at: 1, ended_at: 2 },
  { id: 'r2', name: 'sweep-2', project: 'demo', status: 'failed', started_at: 1, ended_at: 2 },
];
const detail = {
  run: runs[0],
  params: [{ key: 'lr', value: '0.01' }], tags: [{ key: 'model', value: 'resnet' }],
  artifacts: [{ name: 'w.bin', size_bytes: 64, sha256: 'ab'.repeat(32) }],
  metric_keys: [{ key: 'loss' }],
};
const series = [ { step: 0, ts: 100.0, value: 1.0 },
                 { step: 1, ts: 101.5, value: 0.5 },
                 { step: 2, ts: 104.0, value: 0.25 } ];
const compare = {
  runs,
  params: [{ key: 'lr', r1: '0.01', r2: '0.02' }],
  summary: [ { run_id: 'r1', key: 'loss', last_step: 9, last_value: 0.25 },
             { run_id: 'r2', key: 'loss', last_step: 9, last_value: 0.5 } ],
};
global.fetch = async (path, opts) => ({
  ok: true,
  json: async () => {
    if (path === '/api/runs') return runs;
    if (path.startsWith('/api/runs/r1/metrics')) return series;
    if (path.startsWith('/api/runs/r2/metrics')) return series.map(p => ({ step: p.step, ts: p.ts + 50, value: p.value * 2 }));
    if (path.startsWith('/api/runs/r1')) return detail;
    if (path === '/api/compare') { global._cmpBody = JSON.parse(opts.body); return compare; }
    throw new Error('unexpected ' + path);
  },
});

(async () => {
  eval(src);
  await new Promise(r => setTimeout(r, 10));
  const list = elements['runlist']._html;
  if (!list.includes('sweep-1') || !list.includes('sweep-2')) throw new Error('run list missing runs');
  if (!list.includes('class="st failed"')) throw new Error('status class missing');

  await openRun('r1');
  await new Promise(r => setTimeout(r, 10));
  const det = elements['detail']._html;
  for (const want of ['sweep-1', 'lr', '0.01', 'resnet', 'w.bin', '64 B'])
    if (!det.includes(want)) throw new Error('detail missing: ' + want);
  const chart = elements['chart']._html;
  if (!chart.includes('<svg') || !chart.includes('path class="series"')) throw new Error('no svg chart');
  if (!chart.includes('M') || !chart.includes('L')) throw new Error('no line path data');

  // smoothing toggle: the MA5 overlay draws a second path with its legend
  elements['smooth'].checked = true;
  await plotCurrent();
  const smoothed = elements['chart']._html;
  const nDetailPaths = (smoothed.match(/path class="series"/g) || []).length;
  if (nDetailPaths !== 2) throw new Error('smooth toggle must overlay ma5, drew ' + nDetailPaths);
  if (!smoothed.includes('(ma5)')) throw new Error('ma5 legend missing');
  // trailing MA5 over [1.0, 0.5, 0.25]: last smoothed value ≈ 0.5833 — the
  // smoothed max stays 1.0 (first window is the point itself) so the y-axis
  // label is unchanged, but both paths must differ
  const paths = smoothed.match(/d="([^"]*)"/g);
  if (paths[0] === paths[1]) throw new Error('smoothed path identical to raw');

  // x-alignment toggle: relative time re-bases x to seconds since first
  // sample — axis end label becomes 4 (ts 104 - 100), not step 2
  elements['alignsel'].value = 'time';
  await plotCurrent();
  const timed = elements['chart']._html;
  if (!timed.includes('>4<')) throw new Error('relative-time x axis label missing');
  elements['smooth'].checked = false;
  elements['alignsel'].value = 'step';

  // tick the two checkboxes through the real click handler (picked is
  // eval-scoped; drive it through the UI path instead)
  elements['runlist'].listeners['click']({ target: { dataset: { pick: 'r1' }, checked: true } });
  elements['runlist'].listeners['click']({ target: { dataset: { pick: 'r2' }, checked: true } });
  await elements['cmpbtn'].listeners['click']();
  const cmp = elements['compare']._html;
  if (JSON.stringify(global._cmpBody.run_ids.sort()) !== '["r1","r2"]') throw new Error('compare POST body wrong');
  for (const want of ['param diff', 'latest metrics', '0.01', '0.02', '0.25', '0.5'])
    if (!cmp.includes(want)) throw new Error('compare missing: ' + want);

  await new Promise(r => setTimeout(r, 10));
  const overlay = elements['cmpchart']._html;
  const nPaths = (overlay.match(/path class="series"/g) || []).length;
  if (nPaths !== 2) throw new Error('overlay must draw one line per run, drew ' + nPaths);
  if (!overlay.includes('sweep-1') || !overlay.includes('sweep-2'))
    throw new Error('overlay legend missing run names');

  // compare-overlay toggles: smoothing doubles the path count (raw + ma5
  // per run); relative-time alignment re-bases each run to ITS OWN start
  elements['cmpsmooth'].checked = true;
  await elements['cmpsmooth'].listeners['change']();
  const smoothCmp = elements['cmpchart']._html;
  const nCmpPaths = (smoothCmp.match(/path class="series"/g) || []).length;
  if (nCmpPaths !== 4) throw new Error('smoothed overlay must draw 4 paths, drew ' + nCmpPaths);
  elements['cmpsmooth'].checked = false;
  elements['cmpalign'].value = 'time';
  await elements['cmpalign'].listeners['change']();
  // r2 starts 50 s after r1 but both series span 0..4 relative seconds, so
  // the shared axis ends at 4 — per-run re-basing, not a shared clock
  if (!elements['cmpchart']._html.includes('>4<'))
    throw new Error('relative-time overlay must re-base each run to its own start');
  elements['cmpalign'].value = 'step';

  // XSS guard: a hostile run name must arrive escaped
  runs[0].name = '<img src=x onerror=alert(1)>';
  renderRuns();
  if (elements['runlist']._html.includes('<img')) throw new Error('XSS: name not escaped');
  console.log('DASH_CLIENT_OK');
})().catch(e => { console.error('FAIL:', e.message); process.exit(1); });
